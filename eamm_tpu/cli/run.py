"""Training CLI — flag-compatible with the reference runner
(ref:run.py:28-40; the reference file itself cannot run, SURVEY.md §5.1 —
this one can).

    python -m eamm_tpu.cli.run --config config/train_part1.yaml \
        --mode train_part1 --log_dir log/
"""
from __future__ import annotations

import os
import shutil
import time
from argparse import ArgumentParser


def build_parser() -> ArgumentParser:
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True, help="path to config")
    parser.add_argument("--mode", default="train_part1",
                        choices=["train_part1", "train_part1_fine_tune",
                                 "train_part2", "reconstruction", "animate"])
    parser.add_argument("--num_videos", type=int, default=10,
                        help="clips/pairs for reconstruction|animate modes")
    parser.add_argument("--log_dir", default="log", help="log directory")
    parser.add_argument("--checkpoint", default=None,
                        help="'latest' or path to resume from")
    parser.add_argument("--fomm_checkpoint", default=None,
                        help="torch FOMM .pth.tar for the frozen "
                             "generator+kp_detector (ref:train.py:24-28)")
    parser.add_argument("--audio_checkpoint", default=None,
                        help="torch audio .pth.tar (part2 frozen A2FD, "
                             "ref:train.py:283-308)")
    parser.add_argument("--vgg_checkpoint", default=None,
                        help="torchvision vgg19 state_dict (.pth) for the "
                             "fine-tune perceptual loss "
                             "(ref:modules/model.py:10-24); random VGG "
                             "features are used (with a warning) otherwise")
    parser.add_argument("--emo_checkpoint", default=None,
                        help="torch EmotionK .pth.tar; in --mode "
                             "reconstruction its 512-d trunk embedding adds "
                             "the AED metric")
    parser.add_argument("--max_steps", type=int, default=None,
                        help="stop after N optimizer steps (smoke runs)")
    parser.add_argument("--compute_dtype", default=None,
                        choices=["float32", "bfloat16"],
                        help="training compute dtype override (master "
                             "params/optimizer/BN stats stay f32; bfloat16 "
                             "halves HBM traffic on the bandwidth-bound "
                             "fine-tune step)")
    parser.add_argument("--steps_per_dispatch", type=int, default=None,
                        help="scan K optimizer steps inside one device "
                             "program (amortizes per-dispatch latency; "
                             "numerics match sequential steps)")
    parser.add_argument("--grad_accum", type=int, default=None,
                        help="accumulate K micro-batch gradients into one "
                             "optimizer step (K x effective batch at one "
                             "micro-batch's activation memory)")
    parser.add_argument("--seed", type=int, default=0)
    # accepted for reference-CLI parity; the mesh uses all visible devices
    parser.add_argument("--device_ids", default="0", type=str)
    parser.add_argument("--verbose", action="store_true")
    return parser


def main(argv=None):
    opt = build_parser().parse_args(argv)
    from eamm_tpu.config import load_config
    from eamm_tpu.train.loop import train
    from eamm_tpu.utils import enable_persistent_compilation_cache

    # Fresh TPU compiles of the big training programs take 10-25 min through
    # the remote-compile tunnel; share the benches' on-disk cache so a
    # restarted/preempted run (or a re-run after a crash) resumes in seconds.
    enable_persistent_compilation_cache()

    config = load_config(opt.config)
    if opt.compute_dtype:
        config["train_params"]["compute_dtype"] = opt.compute_dtype
    if opt.steps_per_dispatch:
        config["train_params"]["steps_per_dispatch"] = opt.steps_per_dispatch
    if opt.grad_accum:
        config["train_params"]["grad_accum"] = opt.grad_accum

    # timestamped log dir with the config copied in for provenance
    # (ref:run.py:47-56)
    if opt.checkpoint is not None and os.path.isdir(str(opt.checkpoint)):
        log_dir = os.path.dirname(os.path.abspath(opt.checkpoint))
    else:
        base = os.path.basename(opt.config).split(".")[0]
        stamp = time.strftime("%d_%m_%y_%H.%M.%S")
        log_dir = os.path.join(opt.log_dir, f"{base} {stamp}")
    os.makedirs(log_dir, exist_ok=True)
    shutil.copy(opt.config, os.path.join(log_dir,
                                         os.path.basename(opt.config)))

    print(f"mode={opt.mode} log_dir={log_dir}")

    # Checkpoint pre-flight (full report instead of a deep KeyError; the
    # reference's by-name loading contract, ref:train.py:283-299)
    from eamm_tpu.compat.preflight import check_state_dict
    for path in (opt.fomm_checkpoint, opt.audio_checkpoint,
                 opt.emo_checkpoint):
        if path and os.path.isfile(str(path)):
            report = check_state_dict(str(path))
            if report.fatal:
                raise SystemExit(str(report))
            if not report.ok:
                print(report)

    if opt.mode in ("reconstruction", "animate"):
        # FOMM evaluation protocols (the reference run.py imports these
        # modules but they don't exist there — SURVEY.md §5.1)
        import json
        from eamm_tpu import compat
        from eamm_tpu.config import build_kp_detector, build_generator
        from eamm_tpu.data import PairedDataset
        from eamm_tpu.infer.animate import reconstruction, animate
        from eamm_tpu.train.loop import build_dataset
        if not opt.fomm_checkpoint:
            raise SystemExit(f"--mode {opt.mode} requires --fomm_checkpoint")
        fomm = compat.load_torch_checkpoint(opt.fomm_checkpoint)
        models = {"kp_detector": build_kp_detector(config),
                  "generator": build_generator(config)}
        variables = {
            "kp_detector": compat.convert_kp_detector(fomm["kp_detector"]),
            "generator": compat.convert_generator(fomm["generator"])}
        dataset = build_dataset(config, is_train=False)
        if opt.mode == "reconstruction":
            n = config.get("reconstruction_params", {}).get(
                "num_videos", opt.num_videos)
            emotion_feature_fn = None
            if opt.emo_checkpoint:
                import jax
                from eamm_tpu.config import build_emotion_detector
                emo = build_emotion_detector(config)
                emo_vars = compat.convert_emotion_k(
                    compat.load_torch_checkpoint(
                        opt.emo_checkpoint)["emo_detector"])
                emotion_feature_fn = jax.jit(
                    lambda frames: emo.apply(emo_vars, frames,
                                             method=emo.feature))
            out = reconstruction(models, variables, dataset,
                                 min(n, opt.num_videos),
                                 emotion_feature_fn=emotion_feature_fn)
            print(json.dumps(out))
            return out
        ap = config.get("animate_params", {})
        norm = ap.get("normalization_params", {})
        pairs = PairedDataset(
            dataset, number_of_pairs=min(ap.get("num_pairs", opt.num_videos),
                                         opt.num_videos))
        clips = animate(models, variables, pairs,
                        relative=norm.get("use_relative_movement", True),
                        adapt_scale=norm.get("adapt_movement_scale", False))
        out_dir = os.path.join(log_dir, "animation")
        os.makedirs(out_dir, exist_ok=True)
        import numpy as np
        for i, clip in enumerate(clips):
            np.save(os.path.join(out_dir, f"pair_{i}.npy"),
                    (clip * 255).astype("uint8"))
        print(f"saved {len(clips)} animations to {out_dir}")
        return clips
    vgg_params = None
    if opt.vgg_checkpoint:
        from eamm_tpu import compat
        from eamm_tpu.models.vgg import convert_vgg19
        vgg_params = convert_vgg19(
            compat.load_torch_checkpoint(opt.vgg_checkpoint))["params"]
    return train(config, opt.mode, log_dir, checkpoint=opt.checkpoint,
                 max_steps=opt.max_steps, seed=opt.seed,
                 vgg_params=vgg_params,
                 fomm_checkpoint=opt.fomm_checkpoint,
                 audio_checkpoint=opt.audio_checkpoint)


if __name__ == "__main__":
    main()
