"""Pallas shared-source warp vs the reference XLA grid_sample (interpreter
mode on CPU; the real-TPU path is exercised by bench.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eamm_tpu.ops.warp import grid_sample


def _pallas_interpret(source, grids, align_corners=False, tile=128):
    from jax.experimental.pallas import tpu as pltpu
    from eamm_tpu.ops import warp_pallas
    with pltpu.force_tpu_interpret_mode():
        return warp_pallas.grid_sample_shared(source, grids,
                                              align_corners=align_corners,
                                              tile=tile)


@pytest.mark.parametrize("align_corners", [False, True])
def test_matches_xla_grid_sample(align_corners):
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(16, 16, 8), jnp.float32)
    grids = jnp.asarray(rng.uniform(-1.2, 1.2, (3, 8, 8, 2)), jnp.float32)

    ours = _pallas_interpret(src, grids, align_corners)
    B = grids.shape[0]
    ref = grid_sample(jnp.broadcast_to(src[None], (B,) + src.shape), grids,
                      padding_mode="zeros", align_corners=align_corners)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_identity_grid():
    rng = np.random.RandomState(1)
    src = jnp.asarray(rng.randn(8, 8, 4), jnp.float32)
    from eamm_tpu.ops.grid import make_coordinate_grid
    ident = make_coordinate_grid(8, 8)[None]
    out = _pallas_interpret(src, ident, align_corners=True, tile=64)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(src), atol=1e-5)


@pytest.mark.parametrize("align_corners", [False, True])
def test_twolevel_pallas_matches_grid_sample(align_corners):
    from eamm_tpu.ops import warp_pallas
    from jax.experimental.pallas import tpu as pltpu
    rng = np.random.RandomState(2)
    src = jnp.asarray(rng.randn(3, 16, 8, 128), jnp.float32)
    grids = jnp.asarray(rng.uniform(-1.2, 1.2, (3, 8, 8, 2)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        ours = warp_pallas.grid_sample_twolevel_pallas(
            src, grids, align_corners=align_corners, tile=32, exact=True)
    ref = grid_sample(src, grids, padding_mode="zeros",
                      align_corners=align_corners)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_twolevel_pallas_tile_padding():
    """Output-pixel count not a multiple of the tile: padded pixels must
    not leak into the result."""
    from eamm_tpu.ops import warp_pallas
    from jax.experimental.pallas import tpu as pltpu
    rng = np.random.RandomState(3)
    src = jnp.asarray(rng.randn(2, 8, 8, 128), jnp.float32)
    grids = jnp.asarray(rng.uniform(-1.1, 1.1, (2, 5, 3, 2)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        ours = warp_pallas.grid_sample_twolevel_pallas(src, grids, tile=32,
                                                       exact=True)
    ref = grid_sample(src, grids)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_twolevel_pallas_rejects_unaligned_channels():
    from eamm_tpu.ops import warp_pallas
    with pytest.raises(ValueError):
        warp_pallas.grid_sample_twolevel_pallas(
            jnp.zeros((1, 8, 8, 64)), jnp.zeros((1, 4, 4, 2)))


def test_twolevel_pallas_shared_source():
    """image batch 1 + B grids: every grid samples the single shared
    source (the batched-clip inference case, no broadcast in HBM)."""
    from eamm_tpu.ops import warp_pallas
    from jax.experimental.pallas import tpu as pltpu
    rng = np.random.RandomState(5)
    src = jnp.asarray(rng.randn(1, 8, 8, 128), jnp.float32)
    grids = jnp.asarray(rng.uniform(-1.1, 1.1, (4, 8, 8, 2)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        ours = warp_pallas.grid_sample_twolevel_pallas(src, grids, tile=32,
                                                       exact=True)
    ref = grid_sample(jnp.broadcast_to(src, (4,) + src.shape[1:]), grids)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_twolevel_pallas_rejects_batch_mismatch():
    from eamm_tpu.ops import warp_pallas
    with pytest.raises(ValueError):
        warp_pallas.grid_sample_twolevel_pallas(
            jnp.zeros((2, 8, 8, 128)), jnp.zeros((4, 4, 4, 2)))


@pytest.mark.parametrize("align_corners", [False, True])
def test_smallc_pallas_matches_grid_sample(align_corners):
    """Narrow-channel shared-source kernel (the dense-motion deformed-source
    warp) vs the XLA reference at C=3, including out-of-range pixels and a
    pixel count that pads the tile."""
    from eamm_tpu.ops import warp_pallas
    from jax.experimental.pallas import tpu as pltpu
    rng = np.random.RandomState(7)
    src = jnp.asarray(rng.randn(1, 16, 8, 3), jnp.float32)
    grids = jnp.asarray(rng.uniform(-1.2, 1.2, (6, 5, 7, 2)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        ours = warp_pallas.grid_sample_smallc_pallas(
            src, grids, align_corners=align_corners, tile=32, exact=True)
    ref = grid_sample(jnp.broadcast_to(src, (6,) + src.shape[1:]), grids,
                      padding_mode="zeros", align_corners=align_corners)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_smallc_pallas_multi_source_grouping():
    from eamm_tpu.ops import warp_pallas
    from jax.experimental.pallas import tpu as pltpu
    rng = np.random.RandomState(8)
    src = jnp.asarray(rng.randn(2, 8, 8, 3), jnp.float32)
    grids = jnp.asarray(rng.uniform(-1.1, 1.1, (6, 4, 4, 2)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        ours = warp_pallas.grid_sample_smallc_pallas(src, grids, tile=16,
                                                     exact=True)
    ref = grid_sample(jnp.repeat(src, 3, axis=0), grids)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)
    swapped = grid_sample(jnp.repeat(src[::-1], 3, axis=0), grids)
    assert np.abs(np.asarray(ours) - np.asarray(swapped)).max() > 1e-3


def test_smallc_pallas_rejects_wide_channels():
    from eamm_tpu.ops import warp_pallas
    with pytest.raises(ValueError):
        warp_pallas.grid_sample_smallc_pallas(
            jnp.zeros((1, 8, 8, 16)), jnp.zeros((2, 4, 4, 2)))


def test_twolevel_pallas_multi_identity_grouping():
    """Bi=2 sources with B=4 grids: grid b must read source b // 2 (the
    batched-clip production indexing), verified against the explicit
    repeat."""
    from eamm_tpu.ops import warp_pallas
    from jax.experimental.pallas import tpu as pltpu
    rng = np.random.RandomState(6)
    src = jnp.asarray(rng.randn(2, 8, 8, 128), jnp.float32)
    grids = jnp.asarray(rng.uniform(-1.1, 1.1, (4, 8, 8, 2)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        ours = warp_pallas.grid_sample_twolevel_pallas(src, grids, tile=32,
                                                       exact=True)
    ref = grid_sample(jnp.repeat(src, 2, axis=0), grids)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)
    # the sources genuinely differ, so a wrong index map cannot pass
    swapped = grid_sample(jnp.repeat(src[::-1], 2, axis=0), grids)
    assert np.abs(np.asarray(ours) - np.asarray(swapped)).max() > 1e-3


def test_dense_motion_smallc_branch_matches_xla():
    """DenseMotionNetwork(shared_source=True) at bf16 routes its deformed-
    source warp through grid_sample_smallc_pallas; the whole forward must
    match the f32 XLA path at bf16 tolerance (interpret mode on CPU)."""
    from jax.experimental.pallas import tpu as pltpu
    from eamm_tpu.models.dense_motion import DenseMotionNetwork

    net = DenseMotionNetwork(num_kp=10, block_expansion=16, max_features=64,
                             num_blocks=3, scale_factor=0.25)
    rng = np.random.RandomState(11)
    src = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    F = 3
    kp_d = {"value": jnp.asarray(rng.uniform(-1, 1, (F, 10, 2)), jnp.float32),
            "jacobian": jnp.asarray(
                np.tile(np.eye(2, dtype=np.float32), (F, 10, 1, 1))
                + 0.05 * rng.randn(F, 10, 2, 2).astype(np.float32))}
    kp_s = {"value": jnp.asarray(rng.uniform(-1, 1, (F, 10, 2)), jnp.float32),
            "jacobian": jnp.asarray(
                np.tile(np.eye(2, dtype=np.float32), (F, 10, 1, 1)))}
    variables = net.init(jax.random.PRNGKey(0), src,
                         {k: v[:1] for k, v in kp_d.items()},
                         {k: v[:1] for k, v in kp_s.items()})

    ref = net.apply(variables, src, kp_d, kp_s, shared_source=True)

    to_bf16 = lambda t: jax.tree.map(lambda a: a.astype(jnp.bfloat16), t)
    with pltpu.force_tpu_interpret_mode():
        got = net.apply(variables, to_bf16(src), to_bf16(kp_d),
                        to_bf16(kp_s), shared_source=True)
    err = np.abs(np.asarray(got["sparse_deformed"], np.float32)
                 - np.asarray(ref["sparse_deformed"], np.float32))
    assert err.max() < 0.15, err.max()   # bf16 grid quantization bound
    derr = np.abs(np.asarray(got["deformation"], np.float32)
                  - np.asarray(ref["deformation"], np.float32))
    assert derr.max() < 0.1, derr.max()
