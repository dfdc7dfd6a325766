"""Batched rendering must not cost more per identity than single-clip.

The batched path exists to raise aggregate throughput (BASELINE config 3:
N identities share one device program, the shared-source decode indexes
each identity's feature block in-kernel instead of repeating it in HBM).
BENCH_r03 showed batched *delivered* fps below single-clip — plausibly pure
tunnel bound (N x the d2h bytes) but indistinguishable from a chip-side
regression without a compute-only comparison.  bench.py now reports
``batched_compute_only_fps`` (chip evidence); this test guards the program
STRUCTURE on CPU via the compiled cost analysis: the batched program's
FLOPs and bytes-accessed must not materially exceed N x the single-clip
program's (an HBM repeat of the source volume or a per-identity duplicate
of shared work would show here), and re-dispatching with fresh inputs must
not retrace (a per-identity recompile would).  Wall-clock is deliberately
NOT asserted — on the single-core CPU runner it measures cache locality,
not program structure (r4: a healthy batched program timed 1.4x while chip
compute-only showed batched >= single).
"""
import numpy as np
import pytest

from eamm_tpu.infer import EammPipeline, PipelineOptions

TINY_CONFIG = {
    "model_params": {
        "common_params": {"num_kp": 10, "num_channels": 3,
                          "estimate_jacobian": True},
        "audio_params": {"num_kp": 10, "num_channels": 3, "num_channels_a": 3,
                         "estimate_jacobian": True},
        "kp_detector_params": {"temperature": 0.1, "block_expansion": 16,
                               "max_features": 64, "scale_factor": 0.25,
                               "num_blocks": 5},
        "generator_params": {"block_expansion": 16, "max_features": 64,
                             "num_down_blocks": 2, "num_bottleneck_blocks": 1,
                             "estimate_occlusion_map": True,
                             "dense_motion_params": {
                                 "block_expansion": 16, "max_features": 64,
                                 "num_blocks": 5, "scale_factor": 0.25}},
        "discriminator_params": {"scales": [1], "block_expansion": 16,
                                 "max_features": 64, "num_blocks": 4,
                                 "sn": True},
    },
    "train_params": {"jaco_net": "cnn"},
}


def _costs(jitted, *args, **kwargs):
    """(flops, bytes accessed) of the compiled program."""
    analysis = jitted.lower(*args, **kwargs).compile().cost_analysis()
    if isinstance(analysis, (list, tuple)):  # older jax returns [dict]
        analysis = analysis[0]
    return float(analysis["flops"]), float(analysis["bytes accessed"])


@pytest.mark.slow
def test_batched_compute_not_slower_than_sequential():
    n_id = 4
    pipe = EammPipeline.from_random(
        TINY_CONFIG, options=PipelineOptions(frame_chunk=8, time_bucket=8,
                                             add_emo=False))
    rng = np.random.RandomState(0)
    sources = rng.rand(n_id, 256, 256, 3).astype(np.float32)
    wavs = [(0.1 * rng.randn(16000)).astype(np.float32) for _ in range(n_id)]
    poses = [rng.randn(1, 7).astype(np.float32) for _ in range(n_id)]

    # single-clip program: compiled cost of ONE identity
    _, sargs, _ = pipe._prepare_full_render_args(
        sources[0], wavs[0], poses[0], None, False)
    s_flops, s_bytes = _costs(pipe._full_render, pipe.vars, *sargs,
                              add_emo=False)

    # batched program: compiled cost of N identities in one dispatch
    _, bargs = pipe._prepare_batch_args(sources, wavs, poses)
    b_flops, b_bytes = _costs(pipe._batch_render, pipe.vars, *bargs)

    # the batched program does the same per-identity work in one dispatch;
    # small headroom for fusion-boundary differences between the two layouts
    assert b_flops <= 1.20 * n_id * s_flops, (
        f"batched program does {b_flops / (n_id * s_flops):.2f}x the FLOPs of "
        f"{n_id} single-clip programs — duplicated per-identity work")
    assert b_bytes <= 1.30 * n_id * s_bytes, (
        f"batched program moves {b_bytes / (n_id * s_bytes):.2f}x the bytes of "
        f"{n_id} single-clip programs — HBM source-volume repeat regression")

    # dispatching with fresh inputs must reuse the compiled program
    out = pipe._batch_render(pipe.vars, *bargs)
    np.asarray(out[0][:1, :1, :2, :2])
    n_compiles = pipe._batch_render._cache_size()
    _, bargs2 = pipe._prepare_batch_args(
        sources + np.float32(1e-4),
        [w + np.float32(1e-4) for w in wavs], poses)
    out = pipe._batch_render(pipe.vars, *bargs2)
    np.asarray(out[0][:1, :1, :2, :2])
    assert pipe._batch_render._cache_size() == n_compiles, (
        "batched render retraced on fresh same-shape inputs — "
        "per-dispatch recompile regression")
