"""Band-limited (anti-aliased) downsampling.

The reference downsamples 256x256 inputs x0.25 with a fixed sigma=1.5
Gaussian blur followed by strided slicing (ref:modules/util.py:1005-1052);
the same op with per-scale kernels builds the perceptual image pyramid
(ref:modules/model.py:53-68).  The 2-D Gaussian kernel is exactly separable,
so we run two 1-D depthwise convolutions (cheaper on the VPU, bit-identical
after normalization).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def gaussian_kernel_1d(sigma: float = 1.5) -> np.ndarray:
    """Normalized 1-D Gaussian taps; width 2*round(4*sigma)+1 (ref:modules/util.py:1013)."""
    ksize = 2 * round(sigma * 4) + 1
    mean = (ksize - 1) / 2.0
    taps = np.exp(-((np.arange(ksize) - mean) ** 2) / (2.0 * sigma ** 2))
    return (taps / taps.sum()).astype(np.float32)


def antialias_downsample(x: jnp.ndarray, scale: float, sigma: float = 1.5) -> jnp.ndarray:
    """Gaussian blur + strided slice.  x: [B, H, W, C] -> [B, H*scale, W*scale, C].

    scale=1 is the identity (ref:modules/util.py:1045).  The blur uses zero
    padding of ka=ksize//2 on each side (kb==ka for odd kernels), then takes
    every ``int(1/scale)``-th pixel, matching ref:modules/util.py:1044-1052.
    """
    if scale == 1.0:
        return x
    taps = jnp.asarray(gaussian_kernel_1d(sigma), dtype=x.dtype)
    k = taps.shape[0]
    pad = k // 2
    C = x.shape[-1]

    # Separable depthwise blur: convolve H then W.
    kern_h = jnp.tile(taps.reshape(k, 1, 1, 1), (1, 1, 1, C))   # HWIO, I=1 (depthwise)
    kern_w = jnp.tile(taps.reshape(1, k, 1, 1), (1, 1, 1, C))
    dn = jax.lax.conv_dimension_numbers(x.shape, kern_h.shape, ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        x, kern_h, window_strides=(1, 1), padding=[(pad, pad), (0, 0)],
        dimension_numbers=dn, feature_group_count=C)
    out = jax.lax.conv_general_dilated(
        out, kern_w, window_strides=(1, 1), padding=[(0, 0), (pad, pad)],
        dimension_numbers=dn, feature_group_count=C)

    step = int(1.0 / scale)
    return out[:, ::step, ::step, :]
