"""Root-cause the emotional-vs-neutral delivered-fps gap (VERDICT r2 #3).

Round-2 finding: emotional delivery ran at 0.80x same-phase neutral while
stage profiling attributed only ~6 ms to the emotion branch COMPUTE.  The
hypothesis tested here: the missing time is the per-call host->device
upload of the emotion frames (uint8 256^2x3 ~ 192 KiB/frame through the
~30 MB/s tunnel, ~4 MB for the 20-frame bench clip) plus the trunk rerun —
both of which vanish when the clip is prepared once (EmotionHandle).

Measures, interleaved within each trial round (the tunnel's bandwidth
swings ~2x between phases, so only same-round comparisons are meaningful):
  N  neutral delivered fps          (render_yuv420, overlap 8, bf16)
  EC emotional cold delivered fps   (raw frames arg: upload + trunk per call)
  EH emotional handle delivered fps (prepare_emotion once, reuse)
plus the isolated emotion-frame upload time (jnp.asarray + block).

Prints one JSON line.  Usage: python benchmarks/measure_emotion_gap.py
"""
from __future__ import annotations

import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    # share the repo's persistent compile cache with bench.py/conftest so a
    # warm cache is warm for everyone (and this script warms it for them)
    cache = os.environ.get(
        "EAMM_TEST_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import FULL_CONFIG
    from eamm_tpu.infer import EammPipeline, PipelineOptions

    trials = int(os.environ.get("EAMM_GAP_TRIALS", "7"))
    n_emo = int(os.environ.get("EAMM_GAP_EMO_FRAMES", "20"))

    rng = np.random.RandomState(0)
    src = rng.rand(256, 256, 3).astype(np.float32)
    wav = (0.1 * rng.randn(16000 * 10)).astype(np.float32)
    pose = rng.randn(1, 7).astype(np.float32)
    emo_frames = rng.rand(n_emo, 256, 256, 3).astype(np.float32)

    pipe = EammPipeline.from_random(
        FULL_CONFIG, options=PipelineOptions(frame_chunk=32, time_bucket=32,
                                             transfer_format="yuv420",
                                             fetch_streams=8,
                                             overlap_segments=8,
                                             compute_dtype=jnp.bfloat16))
    _pert = itertools.count(1)

    def fresh():
        return wav + np.float32(1e-5 * next(_pert))

    # compiles (neutral, emotional-cold, handle trunk, emotional-from-feats)
    t0 = time.time()
    y, _, _ = pipe.render_yuv420(src, fresh(), pose, add_emo=False)
    T = y.shape[0]
    pipe.render_yuv420(src, fresh(), pose, transformed_video=emo_frames,
                       add_emo=True)
    handle = pipe.prepare_emotion(emo_frames)
    pipe.render_yuv420(src, fresh(), pose, transformed_video=handle,
                       add_emo=True)
    compile_s = time.time() - t0

    # isolated upload cost of the emotion frames (the cold path pays this
    # inside every render call) in BOTH formats: legacy uint8 RGB and the
    # round-5 production packed yuv420 planes (half the bytes)
    from eamm_tpu.ops.colorspace import pack_yuv420_np
    up8 = np.clip(np.rint(emo_frames * 255.0), 0, 255).astype(np.uint8)
    packed = pack_yuv420_np(emo_frames)

    def upload_best(buf):
        times = []
        for i in range(5):
            buf.reshape(-1)[0] = i   # defeat any upload memoization
            t0 = time.time()
            jnp.asarray(buf).block_until_ready()
            times.append(time.time() - t0)
        return 1e3 * min(times)

    upload_ms = upload_best(up8)
    upload_packed_ms = upload_best(packed)

    rounds = {"neutral": [], "emotional_cold": [], "emotional_handle": []}
    for _ in range(trials):
        t0 = time.time()
        pipe.render_yuv420(src, fresh(), pose, add_emo=False)
        rounds["neutral"].append(time.time() - t0)

        t0 = time.time()
        pipe.render_yuv420(src, fresh(), pose, transformed_video=emo_frames,
                           add_emo=True)
        rounds["emotional_cold"].append(time.time() - t0)

        t0 = time.time()
        pipe.render_yuv420(src, fresh(), pose, transformed_video=handle,
                           add_emo=True)
        rounds["emotional_handle"].append(time.time() - t0)

    def stats(ts):
        ts = sorted(ts)
        return {"best_fps": round(T / ts[0], 1),
                "median_fps": round(T / ts[len(ts) // 2], 1),
                "median_ms": round(1e3 * ts[len(ts) // 2], 1)}

    out = {k: stats(v) for k, v in rounds.items()}
    # per-round ratios (same-phase by construction)
    ratios_c = [n / e for n, e in zip(rounds["neutral"],
                                      rounds["emotional_cold"])]
    ratios_h = [n / e for n, e in zip(rounds["neutral"],
                                      rounds["emotional_handle"])]
    out["cold_vs_neutral_median"] = round(sorted(ratios_c)[len(ratios_c) // 2], 3)
    out["handle_vs_neutral_median"] = round(sorted(ratios_h)[len(ratios_h) // 2], 3)
    out["emo_upload_ms_uint8"] = round(upload_ms, 1)
    out["emo_upload_mb"] = round(up8.nbytes / 1e6, 2)
    out["emo_upload_ms_yuv420_packed"] = round(upload_packed_ms, 1)
    out["emo_upload_packed_mb"] = round(packed.nbytes / 1e6, 2)
    out["frames"] = int(T)
    out["trials"] = trials
    out["compile_s"] = round(compile_s, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
