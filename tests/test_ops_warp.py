"""Golden tests for warping ops against torch.nn.functional.

These pin the exact convention the reference ran with (torch >= 1.3
defaults): grid_sample(align_corners=False), interpolate bilinear
(align_corners=False), nearest x2, AvgPool2d(2).
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from eamm_tpu.ops import (grid_sample, resize_bilinear, upsample_nearest_2x,
                          avg_pool_2x)


def _rand_image(b, h, w, c, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(b, h, w, c).astype(np.float32)


def _rand_grid(b, h, w, seed=1, span=1.3):
    rng = np.random.RandomState(seed)
    return rng.uniform(-span, span, size=(b, h, w, 2)).astype(np.float32)


@pytest.mark.parametrize("padding_mode", ["zeros", "border", "reflection"])
@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_matches_torch(padding_mode, align_corners):
    img = _rand_image(2, 13, 17, 3)
    grid = _rand_grid(2, 9, 11, span=1.5)

    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid),
                                  padding_mode=padding_mode,
                                  align_corners=align_corners))
    ref = F.grid_sample(torch.from_numpy(img).permute(0, 3, 1, 2),
                        torch.from_numpy(grid),
                        mode="bilinear", padding_mode=padding_mode,
                        align_corners=align_corners)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.smoke
def test_grid_sample_default_is_reference_default():
    """The reference calls F.grid_sample with no flags (torch>=1.3 =>
    align_corners=False, zeros padding); our default must match."""
    img = _rand_image(1, 64, 64, 3, seed=3)
    grid = _rand_grid(1, 64, 64, seed=4, span=1.1)
    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    ref = F.grid_sample(torch.from_numpy(img).permute(0, 3, 1, 2),
                        torch.from_numpy(grid), mode="bilinear")
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)


@pytest.mark.smoke
def test_resize_bilinear_matches_torch():
    img = _rand_image(2, 64, 64, 2, seed=5)
    ours = np.asarray(resize_bilinear(jnp.asarray(img), (256, 256)))
    ref = F.interpolate(torch.from_numpy(img).permute(0, 3, 1, 2),
                        size=(256, 256), mode="bilinear")
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_resize_bilinear_downscale_matches_torch():
    img = _rand_image(1, 64, 64, 1, seed=6)
    ours = np.asarray(resize_bilinear(jnp.asarray(img), (32, 32)))
    ref = F.interpolate(torch.from_numpy(img).permute(0, 3, 1, 2),
                        size=(32, 32), mode="bilinear")
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_upsample_nearest_matches_torch():
    img = _rand_image(2, 8, 8, 4, seed=7)
    ours = np.asarray(upsample_nearest_2x(jnp.asarray(img)))
    ref = F.interpolate(torch.from_numpy(img).permute(0, 3, 1, 2), scale_factor=2)
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(), atol=1e-6)


def test_avg_pool_matches_torch():
    img = _rand_image(2, 16, 16, 4, seed=8)
    ours = np.asarray(avg_pool_2x(jnp.asarray(img)))
    ref = F.avg_pool2d(torch.from_numpy(img).permute(0, 3, 1, 2), (2, 2))
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(), atol=1e-6)


def test_twolevel_chunked_matches_unchunked_with_grad():
    import jax
    """Large-batch twolevel path (lax.map + checkpoint chunks) must match
    the one-shot path in value AND gradient."""
    from eamm_tpu.ops import warp as warp_mod
    rng = np.random.RandomState(7)
    img = jnp.asarray(rng.randn(6, 8, 8, 3), jnp.float32)
    grid = jnp.asarray(rng.uniform(-1.2, 1.2, (6, 8, 8, 2)), jnp.float32)

    def loss(img, grid):
        out = warp_mod.grid_sample_twolevel(img, grid)
        return jnp.sum(out * out), out

    (l0, o0), g0 = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(img, grid)
    old = warp_mod.TWOLEVEL_MAX_ROWS_BYTES
    warp_mod.TWOLEVEL_MAX_ROWS_BYTES = 8 * 8 * 8 * 3 * 4 * 2  # 2-elem chunks
    try:
        (l1, o1), g1 = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(img, grid)
    finally:
        warp_mod.TWOLEVEL_MAX_ROWS_BYTES = old
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g0[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g0[1]), atol=1e-4)
