"""Pallas TPU kernel for the generator's hot warp.

The inference renderer warps the *same* source feature volume by a different
deformation per frame (ref:modules/generator.py:57 runs once per frame).
A plain XLA gather streams 4 corner reads per output pixel from HBM; the
TPU has no per-lane gather, so this is the slowest op in the pipeline.

Kernel idea: the whole source map (64x64x256 f32 = 4 MB) fits in VMEM, so
hold it there across the grid and turn bilinear sampling into an MXU
matmul: for a tile of output pixels build the sparse bilinear weight matrix
W[tile, Hs*Ws] (4 one-hot bands scaled by the corner weights, constructed
with broadcasted iota compares on the VPU) and compute ``W @ src``.  Output
pixels stream; the source never leaves VMEM.

Semantics: bilinear, zeros padding, align_corners=False — the reference's
F.grid_sample defaults (see eamm_tpu.ops.warp).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _warp_kernel(grid_ref, src_ref, out_ref, *, Hs: int, Ws: int,
                 align_corners: bool, precision):
    n_in = Hs * Ws
    tile = grid_ref.shape[0]
    gx = grid_ref[:, 0]
    gy = grid_ref[:, 1]
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (Ws - 1)
        fy = (gy + 1.0) * 0.5 * (Hs - 1)
    else:
        fx = ((gx + 1.0) * Ws - 1.0) * 0.5
        fy = ((gy + 1.0) * Hs - 1.0) * 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx1 = fx - x0
    wy1 = fy - y0

    col = jax.lax.broadcasted_iota(jnp.int32, (tile, n_in), 1)

    def band(cx, cy, w):
        valid = ((cx >= 0) & (cx <= Ws - 1) & (cy >= 0) & (cy <= Hs - 1))
        idx = (cy.astype(jnp.int32) * Ws + cx.astype(jnp.int32))
        idx = jnp.clip(idx, 0, n_in - 1)
        wgt = jnp.where(valid, w, 0.0)
        return jnp.where(col == idx[:, None], wgt[:, None], 0.0)

    W = (band(x0, y0, (1 - wx1) * (1 - wy1))
         + band(x0 + 1, y0, wx1 * (1 - wy1))
         + band(x0, y0 + 1, (1 - wx1) * wy1)
         + band(x0 + 1, y0 + 1, wx1 * wy1))
    out_ref[:] = jnp.dot(W, src_ref[:], preferred_element_type=jnp.float32,
                         precision=precision).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("align_corners", "tile", "exact"))
def grid_sample_shared(source: jnp.ndarray, grids: jnp.ndarray,
                       align_corners: bool = False,
                       tile: int = 128, exact: bool = False) -> jnp.ndarray:
    """Warp one shared source by many grids.

    source: [Hs, Ws, C]; grids: [N, Ho, Wo, 2] (x, y in [-1, 1]).
    Returns [N, Ho, Wo, C].  zeros padding.

    exact=False runs the one-hot matmul at native MXU (bf16-multiply)
    precision — relative error ~3e-3, well inside the <1e-2 image budget;
    exact=True forces f32-equivalent passes (slower).
    """
    Hs, Ws, C = source.shape
    N, Ho, Wo, _ = grids.shape
    n_out = N * Ho * Wo
    flat_grids = grids.reshape(n_out, 2)
    pad = (-n_out) % tile
    if pad:
        flat_grids = jnp.pad(flat_grids, ((0, pad), (0, 0)),
                             constant_values=-2.0)
    src_flat = source.reshape(Hs * Ws, C)

    precision = (jax.lax.Precision.HIGHEST if exact
                 else jax.lax.Precision.DEFAULT)
    kernel = functools.partial(_warp_kernel, Hs=Hs, Ws=Ws,
                               align_corners=align_corners,
                               precision=precision)
    out = pl.pallas_call(
        kernel,
        grid=( (n_out + pad) // tile, ),
        in_specs=[
            pl.BlockSpec((tile, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Hs * Ws, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(((n_out + pad), C), source.dtype),
    )(flat_grids, src_flat)
    return out[:n_out].reshape(N, Ho, Wo, C)
