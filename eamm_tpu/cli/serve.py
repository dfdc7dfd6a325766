"""``eamm-serve`` — production render server over HTTP.

Loads the reference's three torch checkpoints (same flags as the demo
CLI, ref:demo.py:82-95,536-541), builds an ``EammPipeline`` with the
production delivery options, wraps it in the dynamic-batching
``RenderServer`` and serves the stdlib HTTP front
(:mod:`eamm_tpu.serve_http`: POST /render, POST /render_stream,
GET /stats, GET /healthz).

The reference has no serving entry point at all; this is the deployment
face of the framework.
"""
from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--artifact", default=None,
                   help="serve from a frozen .eammx render artifact "
                        "(eamm-export) instead of checkpoints: no model "
                        "code or config needed; max_batch is taken from "
                        "the artifact")
    p.add_argument("--config", help="path to config yaml")
    p.add_argument("--checkpoint",
                   help="FOMM .pth.tar (generator + kp_detector)")
    p.add_argument("--audio_checkpoint",
                   help="A2FD .pth.tar (audio_feature + kp_detector_a)")
    p.add_argument("--emo_checkpoint",
                   help="emotion .pth.tar (emo_detector)")
    p.add_argument("--type", default="linear_3", dest="emo_type")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--max_batch", type=int, default=4,
                   help="clips per coalesced device dispatch")
    p.add_argument("--max_delay_ms", type=float, default=50.0,
                   help="batching window after the first queued request")
    p.add_argument("--transfer_format", default="yuv420",
                   choices=["rgb", "yuv420"])
    p.add_argument("--overlap_segments", type=int, default=8)
    p.add_argument("--frame_chunk", type=int, default=32)
    p.add_argument("--time_bucket", type=int, default=32)
    p.add_argument("--segment_frames", type=int, default=128,
                   help="unbounded-streaming chunk size (frames): long "
                        "clips render through ONE compiled chunk-program "
                        "pair — any length, zero per-length compiles, "
                        "O(chunk) device memory.  0 disables (every clip "
                        "compiles a whole-clip bucket).  Must be a "
                        "multiple of --frame_chunk")
    p.add_argument("--stream_policy_frames", type=int, default=384,
                   help="length policy: clips at most this many frames "
                        "(~15 s) keep the ~2x-faster whole-clip bucketed "
                        "programs; longer clips take the unbounded chunk "
                        "programs and dispatch as singletons.  0 = every "
                        "clip chunks")
    p.add_argument("--f32", action="store_true",
                   help="disable the default bfloat16 compute")
    p.add_argument("--warmup_seconds", type=float, default=0.0,
                   help="pre-compile with a silent clip of this length "
                        "before accepting traffic")
    return p


def main(argv=None, stop_event=None, ready=None):
    """``stop_event`` / ``ready`` are test hooks: a threading.Event to end
    the serve loop, and a callback receiving the live ``HttpRenderFront``."""
    opt = build_parser().parse_args(argv)

    import numpy as np
    import jax.numpy as jnp
    from eamm_tpu.config import load_config
    from eamm_tpu.infer import EammPipeline, PipelineOptions
    from eamm_tpu.serve import RenderServer
    from eamm_tpu.serve_http import HttpRenderFront

    if opt.artifact:
        from eamm_tpu.infer.export import RenderArtifact, ArtifactPipeline
        art = RenderArtifact.load(opt.artifact)
        pipe = ArtifactPipeline(art)
        opt.max_batch = art.batch          # dispatch size is frozen in
        opt.transfer_format = pipe.options.transfer_format
        stream = art.meta.get("streaming")
        opt.overlap_segments = int(stream["segments"]) if stream else 1
    else:
        for flag in ("config", "checkpoint", "audio_checkpoint",
                     "emo_checkpoint"):
            if getattr(opt, flag) is None:
                raise SystemExit(f"--{flag} is required without --artifact")
        options = PipelineOptions(
            emo_type=opt.emo_type,
            transfer_format=opt.transfer_format,
            overlap_segments=max(1, opt.overlap_segments),
            frame_chunk=opt.frame_chunk, time_bucket=opt.time_bucket,
            segment_frames=opt.segment_frames or None,
            stream_policy_frames=opt.stream_policy_frames or None,
            compute_dtype=(jnp.float32 if opt.f32 else jnp.bfloat16))
        pipe = EammPipeline.from_torch_checkpoints(
            load_config(opt.config), opt.checkpoint, opt.audio_checkpoint,
            opt.emo_checkpoint, options)
    server = RenderServer(pipe, max_batch=opt.max_batch,
                          max_delay_ms=opt.max_delay_ms)

    if opt.warmup_seconds > 0:
        # compile both program families for this clip-length bucket before
        # going live: the coalesced-batch programs (render) AND the
        # singleton kp-stage/segment programs (render_stream) — a fresh
        # compile through a remote-compile tunnel can take many minutes,
        # during which the single dispatch worker would stall all traffic
        wav = np.zeros(int(16000 * opt.warmup_seconds), np.float32)
        src = np.zeros((256, 256, 3), np.float32)
        pose = np.zeros((1, 7), np.float32)
        server.render(src, wav, pose)
        for _ in server.submit_stream(src, wav, pose):
            pass
        sf = getattr(pipe.options, "segment_frames", None)
        if sf:
            # compile the unbounded chunk-program pair too: one clip just
            # past the length policy (frames are 40 ms each); afterwards
            # ANY clip length serves with zero new compiles
            pol = getattr(pipe.options, "stream_policy_frames", None) or 0
            long_wav = np.zeros(int(16000 * (pol + sf) * 0.040) + 16000,
                                np.float32)
            for _ in server.submit_stream(src, long_wav, pose):
                pass
        server.reset_stats()

    front = HttpRenderFront(server, host=opt.host, port=opt.port)
    print(f"eamm-serve listening on {front.url} "
          f"(max_batch={opt.max_batch}, {opt.transfer_format}, "
          f"S={opt.overlap_segments})", flush=True)
    try:
        import threading
        stop = stop_event or threading.Event()
        try:
            import signal
            for sig in (signal.SIGINT, signal.SIGTERM):
                signal.signal(sig, lambda *_: stop.set())
        except ValueError:
            pass                    # not the main thread (tests)
        if ready is not None:
            ready(front)
        stop.wait()
    finally:
        front.close()
        server.stop()


if __name__ == "__main__":
    main()
