"""Stage-level compute attribution for the one-shot inference pipeline.

Times each jitted stage of EammPipeline compute-only (block_until_ready on
device, no host fetch) at production config, so optimization work targets
the actual hot stage rather than priors.  Prints one JSON line per
measurement.  Usage:  python benchmarks/profile_render.py [--trace DIR]

With --trace, additionally captures a jax.profiler trace of the fused
whole-clip program (open with TensorBoard/xprof).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _best_of(fn, n=3):
    dt = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = min(dt, time.perf_counter() - t0)
    return dt


def _block(x):
    import jax
    jax.tree.map(lambda a: a.block_until_ready(), x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None)
    ap.add_argument("--clip_seconds", type=int, default=10)
    ap.add_argument("--emo_frames", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    # share the repo's persistent compile cache with bench.py/conftest
    cache = os.environ.get(
        "EAMM_TEST_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import FULL_CONFIG
    from eamm_tpu.infer import EammPipeline, PipelineOptions

    rng = np.random.RandomState(0)
    src_np = rng.rand(256, 256, 3).astype(np.float32)
    wav = (0.1 * rng.randn(16000 * args.clip_seconds)).astype(np.float32)
    pose = rng.randn(1, 7).astype(np.float32)
    emo_np = rng.rand(args.emo_frames, 256, 256, 3).astype(np.float32)

    results = {}
    for dtype_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        pipe = EammPipeline.from_random(
            FULL_CONFIG, options=PipelineOptions(
                frame_chunk=128, time_bucket=128, add_emo=False,
                compute_dtype=dt))
        T, full_args, _ = pipe._prepare_full_render_args(
            src_np, wav, pose, None, False)
        Tp = full_args[2].shape[0]

        # --- stage: audio (MFCC + ATNet + kp head + one-euro), f32 always
        src = full_args[0]
        from eamm_tpu.ops.mfcc import audio_to_mfcc_windows
        win = jax.jit(audio_to_mfcc_windows)(full_args[1])[:Tp]
        win.block_until_ready()
        out = pipe._audio_kp_stage(pipe.vars, src, win, full_args[2])
        _block(out)
        results[f"audio_stage_ms_{dtype_name}"] = round(_best_of(
            lambda: _block(pipe._audio_kp_stage(
                pipe.vars, src, win, full_args[2]))) * 1e3, 1)

        # --- stage: emotion trunk+heads on unique frames, per current impl
        emo_frames = jnp.asarray(emo_np)
        kpv = out[1]["value"]
        kpj = out[1]["jacobian"]
        idx = jnp.arange(Tp) % args.emo_frames
        es = jax.jit(lambda v, f, a, b: pipe._emotion_stage_impl(
            v, f, a, b, frame_index=idx))
        r = es(pipe.vars, emo_frames, kpv, kpj)
        _block(r)
        results[f"emotion_stage_ms_{dtype_name}"] = round(_best_of(
            lambda: _block(es(pipe.vars, emo_frames, kpv, kpj))) * 1e3, 1)

        # --- full fused neutral program (compute only)
        fr = pipe._full_render(pipe.vars, *full_args, add_emo=False)
        _block(fr)
        dtm = _best_of(lambda: _block(pipe._full_render(
            pipe.vars, *full_args, add_emo=False)))
        results[f"full_neutral_ms_{dtype_name}"] = round(dtm * 1e3, 1)
        results[f"full_neutral_fps_{dtype_name}"] = round(Tp / dtm, 1)

        # --- full fused emotional program (compute only)
        T2, full_args_e, _ = pipe._prepare_full_render_args(
            src_np, wav, pose, emo_np, True)
        # cold emotion frames now stay host-side in the prepared args (the
        # overlapped path uploads them mid-pipeline); pin to device here so
        # the timed loop measures compute only, not a per-call upload
        full_args_e = tuple(jnp.asarray(a) for a in full_args_e)
        fr = pipe._full_render(pipe.vars, *full_args_e, add_emo=True)
        _block(fr)
        dtm = _best_of(lambda: _block(pipe._full_render(
            pipe.vars, *full_args_e, add_emo=True)))
        results[f"full_emo_ms_{dtype_name}"] = round(dtm * 1e3, 1)
        results[f"full_emo_fps_{dtype_name}"] = round(Tp / dtm, 1)

        results[f"frames_{dtype_name}"] = int(Tp)

        if args.trace and dtype_name == "bf16":
            from eamm_tpu.utils.profiling import trace
            with trace(args.trace):
                _block(pipe._full_render(pipe.vars, *full_args, add_emo=False))
                _block(pipe._full_render(pipe.vars, *full_args_e,
                                         add_emo=True))
            results["trace_dir"] = args.trace

        if dtype_name == "bf16":
            # XLA's own cost model for the whole-clip program: FLOPs and
            # bytes accessed -> MFU / HBM-bandwidth utilization at the
            # measured compute-only fps (the render roofline, BASELINE.md).
            try:
                lowered = pipe._full_render.lower(
                    pipe.vars, *full_args, add_emo=False)
                ca = lowered.compile().cost_analysis()
                ca = ca[0] if isinstance(ca, (list, tuple)) else ca
                flops = float(ca.get("flops", 0.0))
                bytes_acc = float(ca.get("bytes accessed", 0.0))
                secs = results[f"full_neutral_ms_{dtype_name}"] / 1e3
                results["roofline_bf16"] = {
                    "program_gflops": round(flops / 1e9, 1),
                    "program_gbytes": round(bytes_acc / 1e9, 2),
                    "achieved_tflops_per_s": round(flops / secs / 1e12, 2),
                    "mfu_pct_of_197tflops": round(
                        100 * flops / secs / 197e12, 1),
                    "hbm_gb_per_s": round(bytes_acc / secs / 1e9, 1),
                    "hbm_pct_of_819gbps": round(
                        100 * bytes_acc / secs / 819e9, 1),
                }
            except Exception as e:          # cost_analysis is best-effort
                results["roofline_bf16"] = {"error": str(e)}

    print(json.dumps(results))


if __name__ == "__main__":
    main()
