"""rgb_to_yuv420 / yuv420_to_rgb: golden values, roundtrip error bounds.

The yuv420 transfer path exists because the device->host link is the
inference bottleneck (BASELINE.md); its loss must be exactly the loss a
yuv420p video encode imposes — nothing more.
"""
import numpy as np
import jax.numpy as jnp

from eamm_tpu.ops.colorspace import rgb_to_yuv420, yuv420_to_rgb
import pytest


pytestmark = pytest.mark.smoke

def test_primary_colors_golden():
    # BT.601 full-range: white -> Y=255,U=V=128; black -> Y=0,U=V=128.
    img = np.zeros((1, 2, 2, 3), np.float32)
    img[0, 0, 0] = [1, 1, 1]      # one white pixel in a black 2x2 block
    y, u, v = rgb_to_yuv420(jnp.asarray(img))
    assert y.shape == (1, 2, 2) and u.shape == (1, 1, 1)
    np.testing.assert_array_equal(np.asarray(y)[0], [[255, 0], [0, 0]])
    # chroma of the averaged block = neutral 128 (white+3black are all grey)
    assert int(np.asarray(u)[0, 0, 0]) == 128
    assert int(np.asarray(v)[0, 0, 0]) == 128

    # pure red, constant block: Y=76, Cb=85, Cr=255 (JPEG coefficients)
    red = np.ones((1, 2, 2, 3), np.float32) * np.array([1, 0, 0], np.float32)
    y, u, v = rgb_to_yuv420(jnp.asarray(red))
    assert int(np.asarray(y)[0, 0, 0]) == 76
    assert int(np.asarray(u)[0, 0, 0]) == 85
    assert int(np.asarray(v)[0, 0, 0]) == 255


def test_roundtrip_grey_exact():
    # greyscale images have neutral chroma -> roundtrip loss is only the
    # uint8 luma quantization (<= 1/255 in each channel).
    rng = np.random.RandomState(0)
    g = rng.rand(3, 8, 8, 1).astype(np.float32)
    img = np.repeat(g, 3, axis=-1)
    y, u, v = rgb_to_yuv420(jnp.asarray(img))
    back = yuv420_to_rgb(np.asarray(y), np.asarray(u), np.asarray(v))
    err = np.abs(back.astype(np.float32) / 255.0 - img)
    assert err.max() <= 1.5 / 255.0


def test_roundtrip_smooth_color_bound():
    # smooth (chroma-band-limited) content: the codec-equivalent loss.
    xx, yy = np.meshgrid(np.linspace(0, 1, 64), np.linspace(0, 1, 64))
    img = np.stack([0.3 + 0.3 * xx, 0.5 + 0.2 * yy, 0.4 + 0.1 * xx * yy],
                   axis=-1).astype(np.float32)[None]
    y, u, v = rgb_to_yuv420(jnp.asarray(img))
    back = yuv420_to_rgb(np.asarray(y), np.asarray(u), np.asarray(v))
    err = np.abs(back.astype(np.float32) / 255.0 - img)
    assert err.mean() < 4e-3
    assert err.max() < 1.5e-2


def test_batched_leading_axes():
    rng = np.random.RandomState(1)
    img = rng.rand(2, 5, 16, 16, 3).astype(np.float32)   # [N, T, H, W, 3]
    y, u, v = rgb_to_yuv420(jnp.asarray(img))
    assert y.shape == (2, 5, 16, 16)
    assert u.shape == (2, 5, 8, 8) and v.shape == (2, 5, 8, 8)
    back = yuv420_to_rgb(np.asarray(y), np.asarray(u), np.asarray(v))
    assert back.shape == img.shape
    assert back.dtype == np.uint8


def test_pack_unpack_yuv420_roundtrip():
    """Packed-plane emotion upload (pack_yuv420_np host, unpack_yuv420
    device): the roundtrip loss equals the yuv420 delivery path's own
    (quantization + 4:2:0 chroma), and packing agrees with the device
    rgb_to_yuv420 planes exactly."""
    from eamm_tpu.ops.colorspace import pack_yuv420_np, unpack_yuv420
    xx, yy = np.meshgrid(np.linspace(0, 1, 32), np.linspace(0, 1, 32))
    img = np.stack([0.3 + 0.3 * xx, 0.5 + 0.2 * yy, 0.4 + 0.1 * xx * yy],
                   axis=-1).astype(np.float32)[None]
    packed = pack_yuv420_np(img)
    assert packed.shape == (1, 48, 32) and packed.dtype == np.uint8
    # plane agreement with the jittable converter
    y, u, v = rgb_to_yuv420(jnp.asarray(img))
    np.testing.assert_array_equal(packed[:, :32], np.asarray(y))
    np.testing.assert_array_equal(packed[:, 32:, :16], np.asarray(u))
    np.testing.assert_array_equal(packed[:, 32:, 16:], np.asarray(v))
    back = np.asarray(unpack_yuv420(jnp.asarray(packed)))
    assert back.shape == img.shape
    err = np.abs(back - img)
    assert err.mean() < 4e-3 and err.max() < 1.5e-2
    # and unpack matches the host-side yuv420_to_rgb up to its uint8
    # truncation (the device op keeps float precision)
    host = yuv420_to_rgb(np.asarray(y), np.asarray(u), np.asarray(v))
    np.testing.assert_allclose(back * 255.0, host.astype(np.float32),
                               atol=1.0)
