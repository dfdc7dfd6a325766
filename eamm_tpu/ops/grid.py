"""Coordinate grids and keypoint <-> heatmap transforms.

These are the numerical primitives of the first-order-motion keypoint
representation: a [-1, 1]^2 coordinate grid, the Gaussian "stamp" of a
keypoint onto that grid, and the soft-argmax that reads a keypoint back out
of a probability heatmap.

Semantics match the reference (ref:modules/util.py:815-855 and
ref:modules/keypoint_detector.py:40-50) which uses *align-corners* grids:
pixel i of an N-pixel axis maps to 2*i/(N-1) - 1, and the channel order of
the last axis is (x, y).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def make_coordinate_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """[-1,1]^2 mesh of shape [h, w, 2] with (x, y) channel order.

    ref:modules/util.py:839-855
    """
    x = 2.0 * (jnp.arange(w, dtype=dtype) / (w - 1)) - 1.0
    y = 2.0 * (jnp.arange(h, dtype=dtype) / (h - 1)) - 1.0
    xx = jnp.broadcast_to(x[None, :], (h, w))
    yy = jnp.broadcast_to(y[:, None], (h, w))
    return jnp.stack([xx, yy], axis=-1)


def kp2gaussian(kp_value: jnp.ndarray, spatial_size: tuple[int, int],
                kp_variance: float) -> jnp.ndarray:
    """Render keypoints as isotropic Gaussians on the [-1,1]^2 grid.

    kp_value: [..., K, 2] keypoint coordinates (x, y) in [-1, 1].
    Returns [..., K, h, w] with exp(-0.5 * ||z - mu||^2 / var).

    ref:modules/util.py:815-836
    """
    h, w = spatial_size
    grid = make_coordinate_grid(h, w, dtype=kp_value.dtype)          # [h,w,2]
    mean = kp_value[..., None, None, :]                              # [...,K,1,1,2]
    diff = grid - mean
    return jnp.exp(-0.5 * jnp.sum(diff * diff, axis=-1) / kp_variance)


def heatmap_softmax(prediction: jnp.ndarray, temperature: float) -> jnp.ndarray:
    """Spatial softmax over the last two axes with a temperature.

    prediction: [..., K, h, w] raw conv output.
    ref:modules/keypoint_detector.py:84-88
    """
    shape = prediction.shape
    flat = prediction.reshape(shape[:-2] + (-1,))
    return jax.nn.softmax(flat / temperature, axis=-1).reshape(shape)


def gaussian2kp(heatmap: jnp.ndarray) -> jnp.ndarray:
    """Soft-argmax: expected (x, y) position under the heatmap distribution.

    heatmap: [..., K, h, w] (already softmax-normalized).
    Returns [..., K, 2].

    ref:modules/keypoint_detector.py:40-50
    """
    h, w = heatmap.shape[-2:]
    grid = make_coordinate_grid(h, w, dtype=heatmap.dtype)           # [h,w,2]
    return jnp.sum(heatmap[..., None] * grid, axis=(-3, -2))
