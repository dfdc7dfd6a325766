"""Sparse keypoint-motion math of the first-order motion model.

Given source / driving keypoints (position + 2x2 local Jacobian), build the
K+1 candidate backward warps T_{s<-d}(z) that the dense-motion network
weighs into a single deformation field (ref:modules/dense_motion.py:47-67),
and the inference-time keypoint normalization (ref:demo.py:112-132).
"""
from __future__ import annotations

import jax.numpy as jnp

from eamm_tpu.ops.grid import make_coordinate_grid


def inv2x2(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of [..., 2, 2] matrices (avoids the LU
    decomposition path, which XLA only implements for f32, and is much
    cheaper for the per-keypoint Jacobians)."""
    a = m[..., 0, 0]
    b = m[..., 0, 1]
    c = m[..., 1, 0]
    d = m[..., 1, 1]
    det = a * d - b * c
    inv = jnp.stack([jnp.stack([d, -b], axis=-1),
                     jnp.stack([-c, a], axis=-1)], axis=-2)
    return inv / det[..., None, None]


def sparse_motions(spatial_size: tuple[int, int],
                   kp_driving_value: jnp.ndarray,
                   kp_source_value: jnp.ndarray,
                   kp_driving_jacobian: jnp.ndarray | None = None,
                   kp_source_jacobian: jnp.ndarray | None = None) -> jnp.ndarray:
    """Candidate backward warps, identity first.

    Args:
      spatial_size: (h, w) of the motion field.
      kp_*_value: [B, K, 2]; kp_*_jacobian: [B, K, 2, 2] or None.

    Returns [B, K+1, h, w, 2] grids in [-1,1] (x, y): channel 0 is the
    identity grid (background), channels 1..K are
    J_s J_d^{-1} (z - kp_d) + kp_s (ref:modules/dense_motion.py:47-67).
    """
    h, w = spatial_size
    B, K, _ = kp_driving_value.shape
    identity = make_coordinate_grid(h, w, dtype=kp_driving_value.dtype)  # [h,w,2]
    coord = identity[None, None] - kp_driving_value[:, :, None, None, :]  # [B,K,h,w,2]
    if kp_driving_jacobian is not None:
        jac = jnp.matmul(kp_source_jacobian, inv2x2(kp_driving_jacobian))
        coord = jnp.einsum("bkij,bkhwj->bkhwi", jac, coord)
    driving_to_source = coord + kp_source_value[:, :, None, None, :]
    identity_b = jnp.broadcast_to(identity[None, None], (B, 1, h, w, 2))
    return jnp.concatenate([identity_b, driving_to_source], axis=1)


def relative_kp(kp_driving_value, kp_driving_initial_value, kp_source_value,
                kp_driving_jacobian=None, kp_driving_initial_jacobian=None,
                kp_source_jacobian=None, movement_scale: float | jnp.ndarray = 1.0):
    """Relative-movement keypoint transfer (``--relative`` mode).

    value' = scale * (kp_d - kp_d0) + kp_s;
    jacobian' = (J_d J_d0^{-1}) J_s  (ref:demo.py:123-130).
    Returns (value, jacobian) with jacobian possibly None.
    """
    value = (kp_driving_value - kp_driving_initial_value) * movement_scale \
        + kp_source_value
    jacobian = None
    if kp_driving_jacobian is not None:
        diff = jnp.matmul(kp_driving_jacobian,
                          inv2x2(kp_driving_initial_jacobian))
        jacobian = jnp.matmul(diff, kp_source_jacobian)
    return value, jacobian


def convex_hull_area(points) -> float:
    """Area of the convex hull of [K, 2] points (host-side numpy; used only
    for the --adapt_scale movement rescale, ref:demo.py:114-117)."""
    import numpy as np
    from scipy.spatial import ConvexHull
    return float(ConvexHull(np.asarray(points)).volume)


def normalize_kp(kp_source: dict, kp_driving: dict, kp_driving_initial: dict,
                 use_relative_movement: bool = False,
                 use_relative_jacobian: bool = False,
                 adapt_movement_scale: float | jnp.ndarray = 1.0) -> dict:
    """Dict-level wrapper mirroring ref:demo.py:112-132.

    ``adapt_movement_scale`` is a precomputed scalar (sqrt of the hull-area
    ratio) rather than a flag, so the function stays jittable.
    """
    kp_new = dict(kp_driving)
    if use_relative_movement:
        value, jacobian = relative_kp(
            kp_driving["value"], kp_driving_initial["value"], kp_source["value"],
            kp_driving.get("jacobian") if use_relative_jacobian else None,
            kp_driving_initial.get("jacobian"), kp_source.get("jacobian"),
            movement_scale=adapt_movement_scale)
        kp_new["value"] = value
        if use_relative_jacobian and jacobian is not None:
            kp_new["jacobian"] = jacobian
    return kp_new
