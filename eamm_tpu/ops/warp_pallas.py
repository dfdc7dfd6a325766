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


def _smallc_kernel(fy_ref, fx_ref, lanew_ref, src_ref, e_ref, out_ref, *,
                   H: int, W: int, C: int, precision):
    """One tile of output pixels for one batch element, C small (< a lane).

    Same tent factorization as ``_twolevel_kernel``, but the x-tent reduce
    cannot slice rows at lane boundaries (W*C is not a multiple of 128), so
    both remaining stages ride the MXU instead of the VPU: the x-tent is
    built directly on the [tile, W*C] lane grid against the PRECOMPUTED
    per-lane column coordinate (lanew_ref — hoisting the round-3 kernel's
    in-kernel ``iota // C``, an integer division by a non-power-of-2 the
    VPU paid per invocation), multiplied into the rows, and the C channel
    sums fall out as ONE [tile, W*C] x [W*C, C] dot with the channel
    one-hot selector (e_ref) — replacing C full-lane masked reductions
    (cross-lane shuffle cascades) with an MXU pass.  Measured on the v5e
    at the dense-motion production shape: 35.9 -> 11.8 ms per 128-frame
    chunk pair (the round-3 masked-reduction kernel was itself the
    round-3 win over XLA's 44.8 ms).
    """
    tile = fy_ref.shape[2]
    i = pl.program_id(1)
    fy = fy_ref[0, i, :]
    fx = fx_ref[0, i, :]
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (tile, H), 1)
    ty = jnp.maximum(0.0, 1.0 - jnp.abs(fy[:, None] - row_idx.astype(fy.dtype)))
    rows = jnp.dot(ty.astype(src_ref.dtype), src_ref[0],
                   preferred_element_type=jnp.float32,
                   precision=precision)                       # [tile, W*C]
    lane_w = lanew_ref[0]                                     # [W*C] f32
    tx = jnp.maximum(0.0, 1.0 - jnp.abs(fx[:, None] - lane_w[None, :]))
    prod = (tx * rows).astype(src_ref.dtype)                  # [tile, W*C]
    out_ref[0] = jnp.dot(prod, e_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=precision).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("align_corners", "tile", "exact"))
def grid_sample_smallc_pallas(image: jnp.ndarray, grid: jnp.ndarray,
                              align_corners: bool = False,
                              tile: int = 2048,
                              exact: bool = False) -> jnp.ndarray:
    """Gather-free batched bilinear warp for NARROW channel counts with a
    shared source (the dense-motion deformed-source warp: every frame's
    K+1 motions re-sample the same 64x64x3 downsampled source,
    ref:modules/dense_motion.py:47-79).

    The XLA twolevel formulation streams a [B, P, W*C] rows intermediate
    through HBM (2.2 GB at the production chunk shape, forcing a chunked
    lax.map whose per-chunk layout copies alone cost ~17% of the render
    program); here the rows live in VMEM per tile and the tiny shared
    source (24 KB bf16) stays resident across the whole launch.

    image: [Bi, H, W, C], C <= 8, H*W <= 4096; grid: [B, Ho, Wo, 2] with
    Bi dividing B (grid b reads image b // (B//Bi), matching
    ``grid_sample_twolevel_pallas``).  zeros padding.  Returns
    [B, Ho, Wo, C].
    """
    Bi, H, W, C = image.shape
    B, Ho, Wo, _ = grid.shape
    if C > 8:
        raise ValueError(f"C={C}: use grid_sample_twolevel_pallas for wide C")
    if B % Bi:
        raise ValueError(f"image batch {Bi} must divide grid batch {B}")
    P = Ho * Wo
    from eamm_tpu.ops.warp import _unnormalize
    g32 = grid.astype(jnp.float32)
    fx = _unnormalize(g32[..., 0], W, align_corners).reshape(B, P)
    fy = _unnormalize(g32[..., 1], H, align_corners).reshape(B, P)
    tile = min(tile, P)
    pad = (-P) % tile
    if pad:
        fx = jnp.pad(fx, ((0, 0), (0, pad)), constant_values=-10.0)
        fy = jnp.pad(fy, ((0, 0), (0, pad)), constant_values=-10.0)
    n_tiles = (P + pad) // tile

    precision = (jax.lax.Precision.HIGHEST if exact
                 else jax.lax.Precision.DEFAULT)
    kernel = functools.partial(_smallc_kernel, H=H, W=W, C=C,
                               precision=precision)
    group = B // Bi
    # hoisted per-lane constants: the column coordinate each lane carries
    # (lane // C without the in-kernel integer division) and the channel
    # one-hot selector that turns the x-tent reduce into an MXU dot
    lane_w = (jnp.arange(W * C, dtype=jnp.float32) // C).reshape(1, W * C)
    e_sel = (jnp.arange(W * C)[:, None] % C
             == jnp.arange(C)[None, :]).astype(image.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, n_tiles, tile), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tiles, tile), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W * C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W * C), lambda b, i: (b // group, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W * C, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P + pad, C), image.dtype),
    )(fy.reshape(B, n_tiles, tile), fx.reshape(B, n_tiles, tile),
      lane_w, image.reshape(Bi, H, W * C), e_sel)
    return out[:, :P].reshape(B, Ho, Wo, C)


def _twolevel_kernel(fy_ref, fx_ref, src_ref, out_ref, *, H: int, W: int,
                     C: int, precision):
    """One tile of output pixels for one batch element.

    fy/fx: [1, n_tiles, tile] unnormalized pixel coords for the whole batch
    row (16 KB — Mosaic's block rules disallow a (1, tile) vector block, so
    the kernel slices its tile out by program id); src: [1, H, W*C];
    out: [1, tile, C].  rows = tent_y @ src is one MXU dot (f32
    accumulate); the x-tent reduce is an unrolled VPU loop over W static
    lane-aligned column slices (avoids an in-kernel reshape).
    """
    tile = fy_ref.shape[2]
    i = pl.program_id(1)
    fy = fy_ref[0, i, :]                  # coords are always f32 (bf16
    fx = fx_ref[0, i, :]                  # sublane packing forbids the
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (tile, H), 1)  # dyn index)
    ty = jnp.maximum(0.0, 1.0 - jnp.abs(fy[:, None] - row_idx.astype(fy.dtype)))
    rows = jnp.dot(ty.astype(src_ref.dtype), src_ref[0],
                   preferred_element_type=jnp.float32,
                   precision=precision)                       # [tile, W*C]
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (tile, W), 1)
    tx = jnp.maximum(0.0, 1.0 - jnp.abs(fx[:, None] - col_idx.astype(fx.dtype)))
    acc = jnp.zeros((tile, C), jnp.float32)
    for w in range(W):
        acc = acc + tx[:, w][:, None] * rows[:, w * C:(w + 1) * C]
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("align_corners", "tile", "exact"))
def grid_sample_twolevel_pallas(image: jnp.ndarray, grid: jnp.ndarray,
                                align_corners: bool = False,
                                tile: int = 128,
                                exact: bool = False) -> jnp.ndarray:
    """Gather-free batched bilinear warp for WIDE channel counts.

    Same tent-factorized math as eamm_tpu.ops.warp.grid_sample_twolevel
    (zeros padding), but the [tile, W*C] intermediate lives in VMEM instead
    of HBM: the XLA formulation at the generator-bottleneck shape
    [64,64,64,256] would stream an 8.6 GB temp through HBM (~21 ms at v5e
    bandwidth) while the row-gather costs ~26 ms; this kernel keeps the
    per-tile rows on chip so the op runs near the 550 GFLOP MXU cost
    instead.  ref:modules/generator.py:57 (the per-frame deform of the
    encoded source feature).

    image: [Bi, H, W, C] where Bi divides the grid batch B (shared
    sources: grid b reads image b // (B//Bi), i.e. each source serves a
    contiguous run of grids — one identity's frames in batched clip
    inference.  Bi=1 is the single-clip case).  The kernel indexes the
    shared block directly instead of requiring the caller to materialize
    a [B, H, W, C] repeat in HBM (4.3 GB per chunk at the batched
    production shape).
    grid: [B, Ho, Wo, 2].  Returns [B, Ho, Wo, C].
    C must be a multiple of 128 lanes for the in-kernel column slicing.
    """
    Bi, H, W, C = image.shape
    B, Ho, Wo, _ = grid.shape
    if C % 128:
        raise ValueError(f"C={C} must be a multiple of 128")
    if B % Bi:
        raise ValueError(f"image batch {Bi} must divide grid batch {B}")
    P = Ho * Wo
    from eamm_tpu.ops.warp import _unnormalize
    g32 = grid.astype(jnp.float32)
    fx = _unnormalize(g32[..., 0], W, align_corners).reshape(B, P)
    fy = _unnormalize(g32[..., 1], H, align_corners).reshape(B, P)
    pad = (-P) % tile
    if pad:
        # padded pixels sample far outside -> zero tents -> zero output
        fx = jnp.pad(fx, ((0, 0), (0, pad)), constant_values=-10.0)
        fy = jnp.pad(fy, ((0, 0), (0, pad)), constant_values=-10.0)
    n_tiles = (P + pad) // tile

    precision = (jax.lax.Precision.HIGHEST if exact
                 else jax.lax.Precision.DEFAULT)
    kernel = functools.partial(_twolevel_kernel, H=H, W=W, C=C,
                               precision=precision)
    group = B // Bi
    src_ix = lambda b, i: (b // group, 0, 0)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, n_tiles, tile), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tiles, tile), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W * C), src_ix,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P + pad, C), image.dtype),
    )(fy.reshape(B, n_tiles, tile), fx.reshape(B, n_tiles, tile),
      image.reshape(Bi, H, W * C))
    return out[:, :P].reshape(B, Ho, Wo, C)
