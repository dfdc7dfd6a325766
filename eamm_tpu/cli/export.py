"""eamm-export: package a render pipeline into a serialized artifact.

Loads the reference's three torch checkpoints (the demo contract,
ref:demo.py:82-95), converts them, and writes one portable file holding
the frozen StableHLO render program(s) + weights.  A serving host loads
it with ``RenderArtifact.load`` — no model code or converters needed.
"""
from __future__ import annotations

import json
from argparse import ArgumentParser

import yaml


def build_parser() -> ArgumentParser:
    p = ArgumentParser("eamm-export")
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True,
                   help="FOMM checkpoint (generator + kp_detector)")
    p.add_argument("--audio_checkpoint", required=True)
    p.add_argument("--emo_checkpoint", required=True)
    p.add_argument("--out", required=True, help="artifact path (.eammx)")
    p.add_argument("--batch", type=int, default=1,
                   help="identity-batch size of the exported program")
    p.add_argument("--frames", type=int, nargs="+", default=[128, 256],
                   help="padded clip-length buckets to export")
    p.add_argument("--platforms", nargs="+", default=None,
                   help="lowering platforms (default: current backend), "
                        "e.g. --platforms tpu cpu")
    p.add_argument("--emotional", action="store_true",
                   help="also export single-clip emotional (add_emo) render "
                        "programs, one per --frames x --emo_frames bucket")
    p.add_argument("--emo_frames", type=int, nargs="+", default=[32],
                   help="padded unique-emotion-frame buckets (--emotional)")
    p.add_argument("--stream_segments", type=int, default=0,
                   help="also export single-clip streaming programs that "
                        "deliver the clip in N in-order segments (early "
                        "frames while the chip renders the tail); each "
                        "--frames bucket must divide into N render chunks")
    p.add_argument("--unbounded_frames", type=int, default=0,
                   help="also export unbounded-streaming chunk programs at "
                        "this chunk size (frames): ONE frozen program set "
                        "serves ANY clip length with O(chunk) device "
                        "memory; clips longer than --stream_policy_frames "
                        "(or the largest --frames bucket) route through it")
    p.add_argument("--stream_policy_frames", type=int, default=None,
                   help="length policy recorded in the artifact (see "
                        "--unbounded_frames); default: the largest "
                        "--frames bucket")
    p.add_argument("--emo_type", default="linear_3",
                   help="emotion head for the emotional programs "
                        "(demo --type, ref:demo.py:549)")
    p.add_argument("--transfer_format", choices=["rgb", "yuv420"],
                   default="rgb")
    p.add_argument("--compute_dtype", choices=["float32", "bfloat16"],
                   default="float32")
    p.add_argument("--pallas_warp", choices=["auto", "on", "off"],
                   default="auto")
    return p


def main(argv=None):
    import jax.numpy as jnp
    from eamm_tpu.infer import EammPipeline, PipelineOptions
    from eamm_tpu.infer.export import export_render_artifact

    opt = build_parser().parse_args(argv)
    with open(opt.config) as f:
        config = yaml.safe_load(f)
    pallas = {"auto": None, "on": True, "off": False}[opt.pallas_warp]
    options = PipelineOptions(
        add_emo=opt.emotional, emo_type=opt.emo_type,
        transfer_format=opt.transfer_format,
        compute_dtype=jnp.bfloat16 if opt.compute_dtype == "bfloat16"
        else jnp.float32,
        pallas_warp=pallas,
        stream_policy_frames=opt.stream_policy_frames)
    pipe = EammPipeline.from_torch_checkpoints(
        config, opt.checkpoint, opt.audio_checkpoint, opt.emo_checkpoint,
        options=options)
    meta = export_render_artifact(
        pipe, opt.out, batch=opt.batch, frame_buckets=tuple(opt.frames),
        platforms=tuple(opt.platforms) if opt.platforms else None,
        emotional=opt.emotional, emo_frame_buckets=tuple(opt.emo_frames),
        stream_segments=opt.stream_segments,
        unbounded_frames=opt.unbounded_frames)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
