"""Multi-device batched inference: identities sharded over a CPU mesh must
reproduce the unsharded result (the 'batched clip inference' BASELINE config
on a mesh)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eamm_tpu.parallel import host_cpu_mesh, batch_sharding, replicated
from tests.test_infer_pipeline import SMALL_CONFIG
from eamm_tpu.infer import EammPipeline, PipelineOptions


def test_batch_render_sharded_matches_unsharded():
    # 8-frame clips: the sharding-equality contract is shape-independent,
    # and these tests are EXECUTION-bound on the single host core (256^2
    # decode per frame), not compile-bound — round-2's 10-minute runtime
    # was 32-frame renders x4 configs, not cache misses.
    pipe = EammPipeline.from_random(
        SMALL_CONFIG, options=PipelineOptions(frame_chunk=8, time_bucket=8))
    rng = np.random.RandomState(0)
    sources = jnp.asarray(rng.rand(2, 256, 256, 3), jnp.float32)
    windows = jnp.asarray(rng.randn(2, 8, 28, 12), jnp.float32)
    pose = jnp.asarray(rng.randn(2, 8, 6), jnp.float32)

    plain = np.asarray(pipe._batch_render(pipe.vars, sources, windows, pose))

    mesh = host_cpu_mesh(2)
    with mesh:
        sharding = batch_sharding(mesh)
        args = [jax.device_put(x, sharding) for x in (sources, windows, pose)]
        vars_r = jax.device_put(pipe.vars, replicated(mesh))
        sharded = np.asarray(pipe._batch_render(vars_r, *args))

    # bit-identical up to uint8 rounding wobble from reduction order
    assert np.abs(sharded.astype(int) - plain.astype(int)).max() <= 1


def test_time_sharded_single_clip_matches_unsharded():
    """use_mesh(time_shard=True): a SINGLE clip's per-frame decode spreads
    over the mesh (frame axis on 'data'); output must match the
    single-device render — sequence parallelism for the render hot path."""
    pipe = EammPipeline.from_random(
        SMALL_CONFIG, options=PipelineOptions(frame_chunk=8, time_bucket=8))
    rng = np.random.RandomState(1)
    src = rng.rand(256, 256, 3).astype(np.float32)
    wav = (0.1 * rng.randn(4000)).astype(np.float32)   # ~6 frames
    pose = rng.randn(1, 7).astype(np.float32)
    plain = pipe.render_uint8(src, wav, pose, add_emo=False)

    shp = EammPipeline(
        pipe.config, pipe.vars,
        options=PipelineOptions(frame_chunk=8, time_bucket=8))
    mesh = host_cpu_mesh(4)
    shp.use_mesh(mesh, time_shard=True)
    assert shp.options.pallas_warp is False
    with mesh:
        sharded = shp.render_uint8(src, wav, pose, add_emo=False)
    assert np.abs(sharded.astype(int) - plain.astype(int)).max() <= 1

    # the overlapped/streaming path composes with time sharding too
    ov = EammPipeline(
        pipe.config, pipe.vars,
        options=PipelineOptions(frame_chunk=4, time_bucket=8,
                                overlap_segments=2))
    ov.use_mesh(mesh, time_shard=True)
    with mesh:
        segs = list(ov.render_stream(src, wav, pose, add_emo=False))
    got = np.concatenate([p for _, p in segs], axis=0)
    assert np.abs(got.astype(int) - plain.astype(int)).max() <= 1
