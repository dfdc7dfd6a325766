"""Folded subpixel upsample-conv == literal nearest-up + 3x3 conv."""
import numpy as np
import jax
import jax.numpy as jnp

from eamm_tpu.ops.subpixel import upsample_conv3x3_folded
from eamm_tpu.ops.warp import upsample_nearest_2x
from eamm_tpu.models.blocks import UpBlock


def _literal(x, w):
    up = upsample_nearest_2x(x)
    dn = jax.lax.conv_dimension_numbers(up.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(up, w, window_strides=(1, 1),
                                        padding=((1, 1), (1, 1)),
                                        dimension_numbers=dn)


def test_folded_equals_literal():
    rng = np.random.RandomState(0)
    for B, H, W, Ci, Co in [(2, 5, 7, 3, 4), (1, 8, 8, 16, 8)]:
        x = jnp.asarray(rng.randn(B, H, W, Ci).astype(np.float32))
        w = jnp.asarray(0.1 * rng.randn(3, 3, Ci, Co).astype(np.float32))
        got = upsample_conv3x3_folded(x, w)
        want = _literal(x, w)
        assert got.shape == want.shape == (B, 2 * H, 2 * W, Co)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-6, rtol=1e-5)


def test_d2s_fold_equals_literal():
    from eamm_tpu.ops.subpixel import upsample_conv3x3_d2s
    rng = np.random.RandomState(2)
    for B, H, W, Ci, Co in [(2, 5, 7, 3, 4), (1, 8, 8, 16, 8)]:
        x = jnp.asarray(rng.randn(B, H, W, Ci).astype(np.float32))
        w = jnp.asarray(0.1 * rng.randn(3, 3, Ci, Co).astype(np.float32))
        got = upsample_conv3x3_d2s(x, w)
        want = _literal(x, w)
        assert got.shape == want.shape == (B, 2 * H, 2 * W, Co)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-6, rtol=1e-5)


def test_conv_s2d_equals_literal():
    """Space-to-depth thin-output conv == literal SAME conv (the generator
    final 7x7 64->3 shape plus assorted kernels/blocks)."""
    from eamm_tpu.ops.subpixel import conv_s2d
    rng = np.random.RandomState(3)
    for B, H, W, Ci, Co, k, blk in [(2, 16, 16, 5, 3, 7, 4),
                                    (1, 8, 12, 4, 2, 3, 2),
                                    (1, 16, 16, 64, 3, 7, 4),
                                    (2, 12, 8, 3, 1, 5, 4),
                                    (1, 16, 16, 6, 3, 7, 8)]:
        x = jnp.asarray(rng.randn(B, H, W, Ci).astype(np.float32))
        w = jnp.asarray(0.1 * rng.randn(k, k, Ci, Co).astype(np.float32))
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        want = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=((k // 2,) * 2,) * 2,
            dimension_numbers=dn)
        got = conv_s2d(x, w, block=blk)
        assert got.shape == want.shape == (B, H, W, Co)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-5)


def test_conv_s2d_strided_equals_literal():
    """Implicit-s2d stride-b phase-expanded conv == literal SAME conv (the
    generator final-conv path; non-square kernels and odd channel counts
    included)."""
    from eamm_tpu.ops.subpixel import conv_s2d_strided
    rng = np.random.RandomState(4)
    for B, H, W, Ci, Co, kh, kw, blk in [(2, 16, 16, 5, 3, 7, 7, 4),
                                         (1, 8, 12, 4, 2, 3, 3, 2),
                                         (1, 16, 16, 64, 3, 7, 7, 4),
                                         (2, 12, 8, 3, 1, 5, 3, 4),
                                         (1, 16, 16, 6, 3, 7, 5, 8)]:
        x = jnp.asarray(rng.randn(B, H, W, Ci).astype(np.float32))
        w = jnp.asarray(0.1 * rng.randn(kh, kw, Ci, Co).astype(np.float32))
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        want = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1),
            padding=((kh // 2,) * 2, (kw // 2,) * 2), dimension_numbers=dn)
        got = conv_s2d_strided(x, w, block=blk)
        assert got.shape == want.shape == (B, H, W, Co)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-5)


def test_upblock_eval_matches_train_form():
    """The eval-mode UpBlock (folded) equals the literal computation with
    the same params; the param tree keeps the conv/kernel+bias layout."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 6, 6, 8).astype(np.float32))
    block = UpBlock(features=12)
    variables = block.init(jax.random.PRNGKey(0), x, train=False)
    p = variables["params"]
    assert set(p["conv"]) == {"kernel", "bias"}
    assert p["conv"]["kernel"].shape == (3, 3, 8, 12)

    got = block.apply(variables, x, train=False)

    # literal recomputation with the same params (eval BN: running stats)
    w, b = p["conv"]["kernel"], p["conv"]["bias"]
    out = _literal(x, w) + b
    stats = variables["batch_stats"]["norm"]
    inv = 1.0 / np.sqrt(np.asarray(stats["var"]) + 1e-5)
    out = (np.asarray(out) - np.asarray(stats["mean"])) * inv
    out = out * np.asarray(p["norm"]["scale"]) + np.asarray(p["norm"]["bias"])
    want = np.maximum(out, 0.0)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-6, rtol=1e-5)
