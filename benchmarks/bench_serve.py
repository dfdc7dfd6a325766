"""RenderServer throughput under concurrent load on the real chip.

Simulates a burst of concurrent neutral requests (10 s clips, production
delivery options) against the dynamic-batching server and reports
sustained clips/sec, aggregate frames/sec and occupancy/latency stats as
one JSON line.  EAMM_SERVE_REQUESTS / EAMM_SERVE_BATCH override the load
shape.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from eamm_tpu.utils import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    import jax.numpy as jnp
    from bench import FULL_CONFIG
    from eamm_tpu.infer import EammPipeline, PipelineOptions
    from eamm_tpu.serve import RenderServer

    n_requests = int(os.environ.get("EAMM_SERVE_REQUESTS", "8"))
    max_batch = int(os.environ.get("EAMM_SERVE_BATCH", "4"))
    pipe = EammPipeline.from_random(
        FULL_CONFIG, options=PipelineOptions(
            frame_chunk=32, time_bucket=32, add_emo=False,
            transfer_format="yuv420", fetch_streams=8, overlap_segments=8,
            compute_dtype=jnp.bfloat16))
    server = RenderServer(pipe, max_batch=max_batch, max_delay_ms=100)
    rng = np.random.RandomState(0)

    def req():
        return (rng.rand(256, 256, 3).astype(np.float32),
                (0.1 * rng.randn(16000 * 10)).astype(np.float32),
                rng.randn(1, 7).astype(np.float32))

    # warm-up: one full batch compiles the length bucket
    warm = [server.submit(*req()) for _ in range(max_batch)]
    for f in warm:
        f.result(1800)
    server.reset_stats()

    reqs = [req() for _ in range(n_requests)]
    t0 = time.time()
    futures = [server.submit(*r) for r in reqs]
    results = [f.result(1800) for f in futures]
    dt = time.time() - t0
    frames = sum(r[0].shape[0] for r in results)
    stats = server.stats()
    # streaming latency: time-to-first-segment vs whole-clip delivery for a
    # lone request (the interactive-playback case); interleaved A/B because
    # tunnel bandwidth drifts between phases
    ttfs, whole = [], []
    for _ in range(4):
        r = req()
        t1 = time.time()
        it = server.submit_stream(*r)
        first = next(it)
        ttfs.append(time.time() - t1)
        for _ in it:
            pass
        r = req()
        t1 = time.time()
        server.render(*r, timeout=1800)
        whole.append(time.time() - t1)
    first_frames = first[1][0].shape[0] if isinstance(first[1], tuple) \
        else first[1].shape[0]
    server.stop()
    print(json.dumps({
        "metric": "serve_clips_per_sec",
        "requests": n_requests,
        "max_batch": max_batch,
        "clips_per_sec": round(n_requests / dt, 2),
        "aggregate_frames_per_sec": round(frames / dt, 1),
        "burst_wall_sec": round(dt, 2),
        **{k: stats[k] for k in ("mean_batch_occupancy", "mean_latency_ms",
                                 "latency_max_ms")},
        "stream_first_segment_ms_median": round(
            1e3 * float(np.median(ttfs)), 1),
        "stream_first_segment_frames": int(first_frames),
        "whole_clip_ms_median": round(1e3 * float(np.median(whole)), 1),
    }))


if __name__ == "__main__":
    main()
