#!/usr/bin/env python3
"""Benchmark: generated frames/sec/chip at 256x256 (the BASELINE.json metric).

Runs the full one-shot inference pipeline (audio -> MFCC -> A2FD -> audio
keypoints -> smoothing -> batched generator rendering) with production-size
models on the real TPU chip, measures steady-state throughput over a 10 s
clip, and prints ONE JSON line.

``vs_baseline`` is measured, not copied (the reference publishes no numbers
— BASELINE.md): it is the ratio against the reference's frame-at-a-time
generator-forward structure on this host's torch-cpu, cached in
``bench_baseline.json``.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_baseline.json")

FULL_CONFIG = {
    "model_params": {
        "common_params": {"num_kp": 10, "num_channels": 3,
                          "estimate_jacobian": True},
        "audio_params": {"num_kp": 10, "num_channels": 3, "num_channels_a": 3,
                         "estimate_jacobian": True},
        "kp_detector_params": {"temperature": 0.1, "block_expansion": 32,
                               "max_features": 1024, "scale_factor": 0.25,
                               "num_blocks": 5},
        "generator_params": {"block_expansion": 64, "max_features": 512,
                             "num_down_blocks": 2, "num_bottleneck_blocks": 6,
                             "estimate_occlusion_map": True,
                             "dense_motion_params": {
                                 "block_expansion": 64, "max_features": 1024,
                                 "num_blocks": 5, "scale_factor": 0.25}},
        "discriminator_params": {"scales": [1], "block_expansion": 32,
                                 "max_features": 512, "num_blocks": 4,
                                 "sn": True},
    },
    "train_params": {"jaco_net": "cnn"},
}


def reference_fps() -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["torch_cpu_fps"]
    from benchmarks.torch_reference import measure_reference_fps
    fps = measure_reference_fps()
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"torch_cpu_fps": fps,
                   "note": "reference frame-at-a-time generator fwd, torch-cpu"},
                  f)
    return fps


def probe_devices(timeout_s: float) -> bool:
    """Touch the backend with a deadline.  The TPU here sits behind a
    remote tunnel; when the tunnel is down even ``jax.devices()`` hangs
    forever (CLAUDE.md), which would wedge the driver's round-end bench
    run.  The probe runs in a daemon thread — on timeout the caller prints
    an honest error line and exits instead of hanging."""
    import threading
    ok = []

    def _probe():
        import jax
        ds = jax.devices()
        # a downed tunnel makes jax fall back to the CPU backend — that
        # is NOT a usable bench device (the measurement would silently
        # become a CPU number); require an accelerator unless overridden
        if ds and (ds[0].platform != "cpu" or _cpu_allowed()):
            ok.append(len(ds))

    th = threading.Thread(target=_probe, daemon=True)
    th.start()
    th.join(timeout_s)
    return bool(ok)


def _cpu_allowed() -> bool:
    return os.environ.get("EAMM_BENCH_ALLOW_CPU") == "1"


def _subprocess_probe(timeout_s: float) -> tuple[bool, str]:
    """One backend probe in a disposable child process.  A hung or failed
    backend init cannot be retried in-process (jax caches the attempt and
    the probe thread stays stuck inside it), so tunnel-flap retries must
    happen in children; the parent binds its own backend only after a
    child sees the device.

    Returns (ok, reason): reason is 'timeout', 'cpu-only' (backend came up
    but fell back to the CPU platform — a downed tunnel, CLAUDE.md), or a
    stderr snippet for persistent non-flap failures (import/plugin errors).
    """
    import subprocess
    import sys
    code = ("import jax, sys\n"
            "ds = jax.devices()\n"
            "assert ds, 'no devices'\n"
            "if ds[0].platform == 'cpu':\n"
            "    print('CPU_FALLBACK', file=sys.stderr); sys.exit(3)\n")
    if _cpu_allowed():
        code = "import jax; assert jax.devices()\n"
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s, stdout=subprocess.DEVNULL,
            stderr=subprocess.PIPE)
    except subprocess.TimeoutExpired:
        return False, "timeout"
    if r.returncode == 0:
        return True, ""
    err = (r.stderr or b"").decode("utf-8", "replace")
    if "CPU_FALLBACK" in err:
        return False, "cpu-only"
    tail = " | ".join(line for line in err.strip().splitlines()[-3:])
    return False, f"probe-error: {tail[:300]}"


def wait_for_devices(total_s: float) -> tuple[bool, str]:
    """Retry backend probes until one passes or ``total_s`` elapses.  The
    remote tunnel flaps; a single fail-fast probe at round end would
    record an error line when waiting a couple of minutes yields a real
    measurement.

    Per-attempt cap: EAMM_BENCH_ATTEMPT_TIMEOUT (default 60 s, raised
    toward the remaining window on the final attempt in case backend init
    through the tunnel legitimately runs long).  Note the total can
    overshoot ``total_s`` by up to one attempt plus the parent's own
    60 s binding probe — the env var is a soft target, not a hard bound.

    Returns (ok, last_failure_reason).
    """
    cap = float(os.environ.get("EAMM_BENCH_ATTEMPT_TIMEOUT", "60"))
    deadline = time.time() + total_s
    reason = "timeout"
    while True:
        left = deadline - time.time()
        if left <= 0:
            return False, reason
        ok, why = _subprocess_probe(min(cap, max(5.0, left)))
        if ok:
            # the child saw the device; bind this process's backend with
            # whatever window remains (generous floor: init is slow)
            if probe_devices(max(60.0, deadline - time.time())):
                return True, ""
            return False, ("parent-bind: a child probe saw the device but "
                           "this process could not bind the backend")
        reason = why
        # timeouts may mean backend init legitimately runs long through
        # the tunnel: grow the per-attempt cap toward the remaining window
        if why == "timeout":
            cap = min(cap * 1.5, 300.0)
        time.sleep(min(20.0, max(0.0, deadline - time.time())))


_PROBE_ERRORS = {
    "timeout": "jax.devices() did not return within the probe timeout",
    "cpu-only": "backend initialized but only the CPU fallback platform is "
                "available (the remote TPU plugin found no device)",
}


def main():
    # Soft target: wait_for_devices may overshoot by up to one attempt +
    # the parent's 60 s binding probe (documented there).
    ok, reason = wait_for_devices(
        float(os.environ.get("EAMM_BENCH_PROBE_TIMEOUT", "300")))
    if not ok:
        detail = _PROBE_ERRORS.get(reason, reason)
        print(json.dumps({
            "metric": "generated_frames_per_sec_per_chip_256px",
            "value": 0,
            "unit": "frames/sec/chip",
            "vs_baseline": 0,
            "detail": {"error": f"device backend unreachable (remote TPU "
                                f"tunnel down): {detail}; no measurement "
                                f"taken this run"},
        }))
        os._exit(0)         # the hung backend thread cannot be joined

    from eamm_tpu.utils import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    from eamm_tpu.infer import EammPipeline, PipelineOptions

    # Delivery format: yuv420p planes — the mp4-native pixel format.  The
    # measured bottleneck on this runtime is the ~30 MB/s device->host link
    # (the chip renders at ~350 fps compute-only, profiled round 2), so the
    # production path converts to 12 bpp yuv420 on-device (codec-equivalent
    # loss: the encoder performs the identical conversion otherwise) and
    # fetches with concurrent streams.  RGB delivery is reported in detail.
    # compute_dtype=bfloat16 affects only the generator decode convs (the
    # keypoint path stays f32): measured max luma delta 1/255, p99 = 0 vs
    # f32 at production config (guarded by test_bf16_render_quality).
    # overlap_segments=8: the clip renders as 8 segment dispatches after one
    # whole-clip keypoint dispatch, so each segment's device->host fetch
    # rides alongside the next segment's compute (measured: 201 -> 282 fps
    # median delivered; the fetch-vs-compute overlap was verified with an
    # independent probe).  Output is bitwise identical to the single
    # dispatch (test_overlap_matches_single_dispatch).
    import jax.numpy as jnp
    pipe = EammPipeline.from_random(
        FULL_CONFIG, options=PipelineOptions(frame_chunk=32, time_bucket=32,
                                             add_emo=False,
                                             transfer_format="yuv420",
                                             fetch_streams=8,
                                             overlap_segments=8,
                                             compute_dtype=jnp.bfloat16))
    rng = np.random.RandomState(0)
    src = rng.rand(256, 256, 3).astype(np.float32)
    wav = (0.1 * rng.randn(16000 * 10)).astype(np.float32)   # 10 s clip
    pose = rng.randn(1, 7).astype(np.float32)

    # Every timed call must see a waveform no earlier dispatch saw: the
    # runtime memoizes whole dispatches on identical inputs, and the stream
    # / emotional paths reuse the same kp-stage and segment programs as the
    # overlapped whole-clip path, so per-loop offsets that collide in
    # float32 (e.g. 3e-5 vs 1e-5*3) silently return memoized results and
    # report host overhead as compute time.  One global counter keeps all
    # perturbations distinct (1e-5 steps are exactly representable apart
    # in f32 at this magnitude).
    import itertools
    _pert = itertools.count(1)

    def fresh_wav():
        return wav + np.float32(1e-5 * next(_pert))

    # Warm-up (compiles every stage), then best-of-9 with fresh inputs
    # (defeats runtime-level result caching).  Best-of-N because the
    # delivered number is dominated by the remote device->host tunnel,
    # whose bandwidth swings ~2x between phases (CLAUDE.md) — the best
    # run is the reproducible figure, the median is reported alongside
    # (more trials -> a phase-robust median in the recorded artifact).
    y, _, _ = pipe.render_yuv420(src, wav, pose, add_emo=False)
    n_frames = y.shape[0]

    times = []
    for i in range(9):
        w = fresh_wav()
        t0 = time.time()
        pipe.render_yuv420(src, w, pose, add_emo=False)
        times.append(time.time() - t0)
    dt = min(times)
    median_dt = sorted(times)[len(times) // 2]
    fps = n_frames / dt

    # Streaming delivery: time until the FIRST segment (32 frames here) is
    # on the host — the interactive-playback latency.  Reuses the same
    # kp-stage/segment programs as the overlapped path (no extra compile).
    ttfs_best = float("inf")
    for i in range(3):
        it = pipe.render_stream(src, fresh_wav(), pose, add_emo=False)
        t0 = time.time()
        start0, first_payload = next(it)
        ttfs_best = min(ttfs_best, time.time() - t0)
        for _ in it:
            pass
    first_frames = first_payload[0].shape[0]

    # Compute-only fps (tiny on-device readback forces completion without
    # the bulk transfer): the chip-side capability independent of the
    # host-link phase.
    T, args, _ = pipe._prepare_full_render_args(src, wav, pose, None, False)
    out = pipe._full_render(pipe.vars, *args, add_emo=False)
    np.asarray(out[0][:1, :2, :2])
    compute_best = float("inf")
    for i in range(3):
        jw = jnp.asarray(np.asarray(args[1])
                         + np.float32(1e-5 * next(_pert)))
        jw.block_until_ready()
        t0 = time.time()
        out = pipe._full_render(pipe.vars, args[0], jw, *args[2:],
                                add_emo=False)
        np.asarray(out[0][:1, :2, :2])
        compute_best = min(compute_best, time.time() - t0)
    # per DELIVERED frame (the program renders the padded Tp frames, but
    # every other metric in this line counts the clip's true frames)
    compute_fps = n_frames / compute_best

    # RGB-uint8 delivery (the bit-exact path parity tests use), for
    # transparency about the transfer-format advantage.
    rgb_pipe = EammPipeline(
        pipe.config, pipe.vars,
        options=PipelineOptions(frame_chunk=128, time_bucket=128,
                                add_emo=False))
    rgb_pipe.render_uint8(src, wav, pose, add_emo=False)
    w = fresh_wav()
    t0 = time.time()
    rgb_pipe.render_uint8(src, w, pose, add_emo=False)
    rgb_fps = n_frames / (time.time() - t0)

    # Full emotional path (BASELINE config 2).  Default: run it when the
    # persistent compile cache looks warm (its two extra whole-clip
    # programs then cost seconds, not the ~17 min cold compile through the
    # remote-compile tunnel).  EAMM_BENCH_FULL=1/0 overrides either way.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    full_default = ("1" if os.path.isdir(cache_dir)
                    and len(os.listdir(cache_dir)) > 100 else "0")
    emo_fps = emo_cold_fps = emo_vs_neutral = emo_cold_vs_neutral = None
    if os.environ.get("EAMM_BENCH_FULL", full_default) == "1":
        emo_frames = rng.rand(20, 256, 256, 3).astype(np.float32)
        # serving configuration: the emotion clip is fixed across requests,
        # so it is uploaded + trunk-encoded ONCE (prepare_emotion); the cold
        # number (per-call upload + trunk, the one-shot demo scenario) is
        # reported alongside.  Neutral / cold / handle are interleaved per
        # round — the tunnel's ~2x phase swings make only same-round ratios
        # meaningful (CLAUDE.md).
        pipe.render_yuv420(src, fresh_wav(), pose,
                           transformed_video=emo_frames, add_emo=True)
        handle = pipe.prepare_emotion(emo_frames)
        pipe.render_yuv420(src, fresh_wav(), pose,
                           transformed_video=handle, add_emo=True)
        rounds = {"n": [], "ec": [], "eh": []}
        for i in range(5):
            t0 = time.time()
            pipe.render_yuv420(src, fresh_wav(), pose, add_emo=False)
            rounds["n"].append(time.time() - t0)
            t0 = time.time()
            pipe.render_yuv420(src, fresh_wav(), pose,
                               transformed_video=emo_frames, add_emo=True)
            rounds["ec"].append(time.time() - t0)
            t0 = time.time()
            out_e = pipe.render_yuv420(src, fresh_wav(), pose,
                                       transformed_video=handle,
                                       add_emo=True)
            rounds["eh"].append(time.time() - t0)
        T_e = out_e[0].shape[0]
        emo_fps = T_e / min(rounds["eh"])
        emo_cold_fps = T_e / min(rounds["ec"])
        ratios = sorted(n / e for n, e in zip(rounds["n"], rounds["eh"]))
        emo_vs_neutral = ratios[len(ratios) // 2]
        # cold path ratio from the SAME interleaved rounds: how much of the
        # per-call emotion upload + 256^2 trunk the split kp stage
        # (_dispatch_kp_stage's overlapped upload) actually hides
        ratios_c = sorted(n / e for n, e in zip(rounds["n"], rounds["ec"]))
        emo_cold_vs_neutral = ratios_c[len(ratios_c) // 2]

    # Long-clip unbounded streaming (segment_frames chunk programs with the
    # recurrent state threaded between dispatches): a 60 s clip through
    # render_stream.  The SAME two compiled chunk programs serve any clip
    # length (the whole-clip paths compile per time bucket; the reference
    # renders frame-at-a-time into a whole-clip buffer, ref:demo.py:212-281),
    # host memory stays O(chunk), and throughput should hold within ~10% of
    # the 10 s number.  Gated with the emotional block: two extra (small)
    # programs to compile when cold.
    stream60_fps = stream60_vs_10s = None
    if os.environ.get("EAMM_BENCH_FULL", full_default) == "1":
        spipe = EammPipeline(
            pipe.config, pipe.vars,
            options=PipelineOptions(frame_chunk=32, time_bucket=32,
                                    add_emo=False, transfer_format="yuv420",
                                    fetch_streams=8, segment_frames=128,
                                    compute_dtype=jnp.bfloat16))
        wav60 = (0.1 * rng.randn(16000 * 60)).astype(np.float32)
        # warm the chunk programs on a short clip (same shapes by design)
        for _ in spipe.render_stream(src, fresh_wav(), pose, add_emo=False):
            pass
        t0 = time.time()
        n60 = sum(p[0].shape[0] for _, p in spipe.render_stream(
            src, wav60 + np.float32(1e-5 * next(_pert)), pose,
            add_emo=False))
        dt60 = time.time() - t0
        stream60_fps = n60 / dt60
        # 10 s clip through the same chunk programs, same tunnel phase
        t0 = time.time()
        n10 = sum(p[0].shape[0] for _, p in spipe.render_stream(
            src, fresh_wav(), pose, add_emo=False))
        stream60_vs_10s = stream60_fps / (n10 / (time.time() - t0))

    # Batched clip inference (BASELINE config 3): 8 identities x 10 s,
    # best-of-3 with fresh inputs (same phase-noise discipline as the
    # single-clip number).
    n_id = 8
    sources = rng.rand(n_id, 256, 256, 3).astype(np.float32)
    wavs = [(0.1 * rng.randn(16000 * 10)).astype(np.float32)
            for _ in range(n_id)]
    poses = [rng.randn(1, 7).astype(np.float32) for _ in range(n_id)]
    out = pipe.render_batch_yuv420(sources, wavs, poses)      # compile
    batch_times = []
    for i in range(3):
        wavs2 = [w + np.float32(1e-5 * next(_pert)) for w in wavs]
        t0 = time.time()
        out = pipe.render_batch_yuv420(sources, wavs2, poses)
        batch_times.append(time.time() - t0)
    batch_fps = out[0].shape[0] * out[0].shape[1] / min(batch_times)

    # Chip-side batched capability (same dispatches, tiny readback instead
    # of the bulk fetch): separates a real batching regression from the
    # tunnel bound — the delivered batched number ships n_id x the d2h
    # bytes, so it alone cannot tell the two apart.
    def batched_compute_once(wavs_in):
        _, bargs = pipe._prepare_batch_args(sources, wavs_in, poses)
        kv, kj, kp_s, feats = pipe._batch_kp_stage(pipe.vars, *bargs)
        S = max(1, pipe.options.overlap_segments)
        Tseg = kv.shape[1] // S
        seg = None
        for i in range(S):
            seg = pipe._batch_render_segment(pipe.vars, bargs[0], feats,
                                             kp_s, kv, kj, jnp.int32(i),
                                             Tseg)
        # the device queue is in-order: a small slice readback of the LAST
        # segment's output proves every earlier segment finished
        np.asarray(seg[0][:1, :1, :2, :2])

    batched_compute_once(wavs)                                # warm
    bc_best = float("inf")
    for i in range(3):
        wavs2 = [w + np.float32(1e-5 * next(_pert)) for w in wavs]
        t0 = time.time()
        batched_compute_once(wavs2)
        bc_best = min(bc_best, time.time() - t0)
    batch_compute_fps = out[0].shape[0] * out[0].shape[1] / bc_best

    # Tunnel bandwidth probe (fresh buffers each trial — the runtime
    # memoizes identical transfers): the delivered-fps wall in MB/s.
    probe_mb = 8
    h2d_best = d2h_best = float("inf")
    for i in range(3):
        buf = rng.randint(0, 255, (probe_mb << 20,), dtype=np.uint8)
        t0 = time.time()
        dev = jnp.asarray(buf)
        dev.block_until_ready()
        h2d_best = min(h2d_best, time.time() - t0)
        t0 = time.time()
        np.asarray(dev)
        d2h_best = min(d2h_best, time.time() - t0)
    h2d_mbps = probe_mb / h2d_best
    d2h_mbps = probe_mb / d2h_best

    ref_fps = reference_fps()
    print(json.dumps({
        "metric": "generated_frames_per_sec_per_chip_256px",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / ref_fps, 2),
        "detail": {"clip_seconds": 10, "frames": int(n_frames),
                   "end_to_end_sec_per_10s_clip": round(dt, 3),
                   "median_frames_per_sec": round(n_frames / median_dt, 2),
                   "compute_only_frames_per_sec": round(compute_fps, 2),
                   "delivery_format": "yuv420p (mp4-native, 12bpp)",
                   "stream_first_segment_ms": round(1e3 * ttfs_best, 1),
                   "stream_first_segment_frames": int(first_frames),
                   "rgb_uint8_frames_per_sec": round(rgb_fps, 2),
                   "batched_identities": n_id,
                   "batched_frames_per_sec": round(batch_fps, 2),
                   "batched_compute_only_fps": round(batch_compute_fps, 2),
                   "tunnel_h2d_mb_per_s": round(h2d_mbps, 1),
                   "tunnel_d2h_mb_per_s": round(d2h_mbps, 1),
                   **({"emotional_frames_per_sec": round(emo_fps, 2),
                       "emotional_cold_frames_per_sec": round(emo_cold_fps, 2),
                       "emotional_vs_neutral_same_phase":
                           round(emo_vs_neutral, 3),
                       "emotional_cold_vs_neutral_same_phase":
                           round(emo_cold_vs_neutral, 3)}
                      if emo_fps else {}),
                   **({"stream_60s_frames_per_sec": round(stream60_fps, 2),
                       "stream_60s_vs_10s_same_programs":
                           round(stream60_vs_10s, 3)}
                      if stream60_fps else {}),
                   "torch_cpu_reference_fps": round(ref_fps, 2)},
    }))


if __name__ == "__main__":
    main()
