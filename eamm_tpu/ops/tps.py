"""Random affine + thin-plate-spline transform for equivariance losses.

Functional re-design of the reference's ``Transform`` class
(ref:modules/model.py:71-152): parameters are drawn once per batch from a
PRNG key, warps are pure functions, and the keypoint jacobian uses forward-
mode autodiff (the reference uses torch autograd the same way).

Note the reference's TPS radial uses the **L1** distance |z - c|_1
(ref:modules/model.py:111) — reproduced here.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from eamm_tpu.ops.grid import make_coordinate_grid
from eamm_tpu.ops.warp import grid_sample


class TpsParams(NamedTuple):
    theta: jnp.ndarray           # [B, 2, 3] affine
    control_points: jnp.ndarray  # [P^2, 2]
    control_params: jnp.ndarray  # [B, 1, P^2]


def sample_tps(key, batch: int, sigma_affine: float, sigma_tps: float,
               points_tps: int) -> TpsParams:
    k1, k2 = jax.random.split(key)
    theta = (jax.random.normal(k1, (batch, 2, 3)) * sigma_affine
             + jnp.eye(2, 3)[None])
    cp = make_coordinate_grid(points_tps, points_tps).reshape(-1, 2)
    params = jax.random.normal(k2, (batch, 1, points_tps ** 2)) * sigma_tps
    return TpsParams(theta, cp, params)


def warp_coordinates(tps: TpsParams, coords: jnp.ndarray) -> jnp.ndarray:
    """coords: [B, N, 2] -> warped [B, N, 2] (ref:modules/model.py:101-119).

    The TPS correction is a scalar per point added to both coordinates
    (the reference broadcasts a [B,N,1] sum over the xy axis)."""
    out = jnp.einsum("bij,bnj->bni", tps.theta[:, :, :2], coords) \
        + tps.theta[:, None, :, 2]
    dist = jnp.sum(jnp.abs(coords[:, :, None, :]
                           - tps.control_points[None, None]), axis=-1)
    radial = dist ** 2 * jnp.log(dist + 1e-6)                  # [B,N,P^2]
    out = out + jnp.sum(radial * tps.control_params[:, 0, :][:, None, :],
                        axis=2)[..., None]
    return out


def transform_frame(tps: TpsParams, frame: jnp.ndarray) -> jnp.ndarray:
    """Warp NHWC frames by the sampled transform with reflection padding
    (ref:modules/model.py:89-93)."""
    B, H, W, _ = frame.shape
    grid = make_coordinate_grid(H, W).reshape(1, -1, 2)
    grid = jnp.broadcast_to(grid, (B, H * W, 2))
    warped = warp_coordinates(tps, grid).reshape(B, H, W, 2)
    return grid_sample(frame, warped, padding_mode="reflection")


def warp_jacobian(tps: TpsParams, coords: jnp.ndarray) -> jnp.ndarray:
    """d(warp)/d(coords) at each point: [B, N, 2, 2]
    (ref:modules/model.py:146-152, via autograd there, jacfwd here)."""
    def single(theta, cparams, pt):
        one = TpsParams(theta[None], tps.control_points, cparams[None])
        return warp_coordinates(one, pt[None, None])[0, 0]
    jac_pt = jax.jacfwd(single, argnums=2)
    per_batch = jax.vmap(jax.vmap(jac_pt, in_axes=(None, None, 0)),
                         in_axes=(0, 0, 0))
    return per_batch(tps.theta, tps.control_params, coords)
