"""Bilinear warping / resampling primitives (NHWC layout).

``grid_sample`` reproduces the exact semantics of ``torch.nn.functional.
grid_sample(mode='bilinear')`` as exercised by the reference under its pinned
torch 1.10 (ref:requirements.txt): since torch 1.3 the default is
``align_corners=False`` and the reference never passes the flag, so the
published checkpoints were trained with align_corners=False + zero padding
(ref:modules/dense_motion.py:77, ref:modules/generator.py:57) and reflection
padding for the equivariance transform (ref:modules/model.py:93).  Both modes
are implemented and golden-tested against torch in
tests/test_warp.py.

Everything here is pure XLA (gathers + fused elementwise); a Pallas TPU
kernel for the hot generator warp lives in eamm_tpu/ops/warp_pallas.py.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp


# Cap on the twolevel rows intermediate before the batch axis is chunked
# (module-level so tests can exercise the chunked path at small shapes).
TWOLEVEL_MAX_ROWS_BYTES = 1_300_000_000


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    """Map [-1, 1] to pixel coordinates."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _reflect(coord: jnp.ndarray, low: float, high: float) -> jnp.ndarray:
    """Reflect pixel coordinates into [low/2, high/2] (torch semantics)."""
    # torch reflect_coordinates works on twice the coordinate range.
    span = high - low
    safe_span = jnp.where(span <= 0, 1.0, span)
    c = jnp.abs(coord * 2.0 - low)
    extra = jnp.mod(c, safe_span)
    flips = jnp.floor(c / safe_span)
    reflected = jnp.where(jnp.mod(flips, 2.0) == 0.0, extra + low, span - extra + low)
    return jnp.where(span <= 0, jnp.zeros_like(coord), reflected * 0.5)


def grid_sample(image: jnp.ndarray, grid: jnp.ndarray, *,
                padding_mode: str = "zeros",
                align_corners: bool = False) -> jnp.ndarray:
    """Bilinear sampling of ``image`` at ``grid`` locations.

    Args:
      image: [B, H, W, C] input.
      grid:  [B, Ho, Wo, 2] sample locations, last axis = (x, y) in [-1, 1].
      padding_mode: 'zeros' | 'border' | 'reflection'.
      align_corners: coordinate convention (see module docstring).

    Returns [B, Ho, Wo, C].

    Narrow images (small C) avoid TPU gathers, which cost ~28 cycles per
    ROW regardless of row width (round-2 xprof: the dense-motion warp's
    row-gathers were 57% of render compute):

    * small planes (H*W <= 4096, i.e. the 64x64 dense-motion source) use
      ``grid_sample_twolevel`` — bilinear sampling as two tent-matrix
      contractions, zero gathers, 3x faster than the patch-table gather at
      the hot shape (measured 69->23 ms f32 / 32->13 ms bf16 per
      [704,64,64,3] warp on v5e) and its gradient is matmuls instead of
      scatters;
    * larger narrow planes use a 2x2-patch-table gather: one gather of
      4C-wide rows instead of four C-wide row gathers.
    """
    B, H, W, C = image.shape
    if 4 * C <= 32 and padding_mode in ("zeros", "border"):
        if H * W <= 4096:
            return grid_sample_twolevel(image, grid,
                                        padding_mode=padding_mode,
                                        align_corners=align_corners)
        return _grid_sample_patched(image, grid, padding_mode=padding_mode,
                                    align_corners=align_corners)
    compute_dtype = grid.dtype
    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)

    if padding_mode == "reflection":
        if align_corners:
            x = _reflect(x, 0.0, 2.0 * (W - 1))
            y = _reflect(y, 0.0, 2.0 * (H - 1))
        else:
            x = _reflect(x, -1.0, 2.0 * W - 1.0)
            y = _reflect(y, -1.0, 2.0 * H - 1.0)
        x = jnp.clip(x, 0, W - 1)
        y = jnp.clip(y, 0, H - 1)
    elif padding_mode == "border":
        x = jnp.clip(x, 0, W - 1)
        y = jnp.clip(y, 0, H - 1)
    elif padding_mode != "zeros":
        raise ValueError(f"unknown padding_mode {padding_mode!r}")

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1

    def corner_weight(ix, iy, wx, wy):
        if padding_mode == "zeros":
            valid = ((ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1))
            return jnp.where(valid, wx * wy, 0.0)
        return wx * wy

    def gather(ix, iy):
        ix_c = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iy_c = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        flat_idx = iy_c * W + ix_c                       # [B, Ho, Wo]
        img_flat = image.reshape(B, H * W, C)
        return jnp.take_along_axis(
            img_flat, flat_idx.reshape(B, -1, 1), axis=1
        ).reshape(flat_idx.shape + (C,))

    out = (gather(x0, y0) * corner_weight(x0, y0, wx0, wy0)[..., None]
           + gather(x1, y0) * corner_weight(x1, y0, wx1, wy0)[..., None]
           + gather(x0, y1) * corner_weight(x0, y1, wx0, wy1)[..., None]
           + gather(x1, y1) * corner_weight(x1, y1, wx1, wy1)[..., None])
    return out.astype(image.dtype) if image.dtype != compute_dtype else out


def grid_sample_twolevel(image: jnp.ndarray, grid: jnp.ndarray, *,
                         padding_mode: str = "zeros",
                         align_corners: bool = False) -> jnp.ndarray:
    """Exact bilinear ``grid_sample`` (zeros/border padding) with NO gathers.

    Bilinear sampling separates per axis: out = tent_y · src · tent_x where
    tent(r) = max(0, 1 - |coord - r|) is nonzero at exactly the two corner
    rows/columns with exactly the corner weights.  Step 1 contracts the
    source rows with the per-pixel y-tents — a batched MXU matmul — and
    step 2 reduces over columns with the x-tents on the VPU.  Out-of-range
    coordinates get zero tents everywhere, which IS zeros padding; border
    mode clamps coordinates first, exactly like the gather formulation.

    TPU gathers cost ~28 cycles per row regardless of width (round-2 xprof
    measurement: the dense-motion warp's row-gathers = 57% of render
    compute), so replacing the gather with ~71 GFLOP of matmul is a 3x
    measured win at the hot shape.  f32 inputs force HIGHEST matmul
    precision so parity-path numerics stay exact (maxdiff 1.8e-7 vs the
    gather path); bf16 runs at native MXU precision.

    The [B, P, W, C] y-interpolated rows intermediate is the memory cost
    (a residual under autodiff: the x-tent backward reads it).  Above
    ~1.2 GiB the batch axis is processed in lax.map chunks with
    jax.checkpoint, so backward recomputes each chunk's rows instead of
    holding them all — without this the fine-tune training step
    (B=1056 warps, 3.3 GB of rows f32) exhausts v5e HBM.

    image: [B, H, W, C]; grid: [B, Ho, Wo, 2].  Returns [B, Ho, Wo, C].
    """
    B, H, W, C = image.shape
    _, Ho, Wo, _ = grid.shape
    dt = grid.dtype
    fx = _unnormalize(grid[..., 0], W, align_corners).reshape(B, Ho * Wo)
    fy = _unnormalize(grid[..., 1], H, align_corners).reshape(B, Ho * Wo)
    if padding_mode == "border":
        fx = jnp.clip(fx, 0, W - 1)
        fy = jnp.clip(fy, 0, H - 1)
    elif padding_mode != "zeros":
        raise ValueError(f"unsupported padding_mode {padding_mode!r}")

    rows_idx = jnp.arange(H, dtype=dt)
    cols_idx = jnp.arange(W, dtype=dt)
    precision = (jax.lax.Precision.HIGHEST if dt == jnp.float32
                 else jax.lax.Precision.DEFAULT)

    def coords_to_out(fy, fx, img_flat):
        # tents built inside so the chunked/checkpointed path keeps only
        # the [b,P] coords as residuals, not the [b,P,H+W] tents
        tent_y = jnp.maximum(0.0, 1.0 - jnp.abs(fy[..., None] - rows_idx))
        tent_x = jnp.maximum(0.0, 1.0 - jnp.abs(fx[..., None] - cols_idx))
        # [b,P,H] x [b,H,W*C] -> [b,P,W,C]: the y-interpolated source row
        # per output pixel (2 nonzero tents -> sum of two rows)
        rows = jnp.einsum("bph,bhx->bpx", tent_y, img_flat,
                          precision=precision).reshape(
                              tent_y.shape[0], Ho * Wo, W, C)
        return jnp.einsum("bpw,bpwc->bpc", tent_x, rows, precision=precision)

    img_flat = image.astype(dt).reshape(B, H, W * C)
    itemsize = jnp.dtype(dt).itemsize
    rows_bytes = B * Ho * Wo * W * C * itemsize
    if rows_bytes > TWOLEVEL_MAX_ROWS_BYTES:
        chunk = max(1, TWOLEVEL_MAX_ROWS_BYTES // (Ho * Wo * W * C * itemsize))
        pad = (-B) % chunk
        if pad:
            fy = jnp.pad(fy, ((0, pad), (0, 0)), constant_values=-10.0)
            fx = jnp.pad(fx, ((0, pad), (0, 0)), constant_values=-10.0)
            img_flat = jnp.pad(img_flat, ((0, pad), (0, 0), (0, 0)))
        n = (B + pad) // chunk
        out = jax.lax.map(
            jax.checkpoint(lambda args: coords_to_out(*args)),
            (fy.reshape(n, chunk, Ho * Wo),
             fx.reshape(n, chunk, Ho * Wo),
             img_flat.reshape(n, chunk, H, W * C)))
        out = out.reshape(B + pad, Ho * Wo, C)[:B]
    else:
        out = coords_to_out(fy, fx, img_flat)
    return out.reshape(B, Ho, Wo, C).astype(image.dtype)


def _grid_sample_patched(image: jnp.ndarray, grid: jnp.ndarray, *,
                         padding_mode: str,
                         align_corners: bool) -> jnp.ndarray:
    """``grid_sample`` for narrow images via one patch-table gather.

    The table holds every zero-padded 2x2 patch as one row ([B, H*W, 4C]);
    each output pixel gathers the row at its clamped top-left corner and
    weights the four slots with the bilinear tent kernel of their TRUE
    positions.  Out-of-bounds corners receive tent weight 0 (zeros padding)
    or never occur (border mode clamps coordinates first), so the result is
    the same corner sum as the 4-gather formulation.
    """
    B, H, W, C = image.shape
    _, Ho, Wo, _ = grid.shape
    compute_dtype = grid.dtype
    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)
    if padding_mode == "border":
        x = jnp.clip(x, 0, W - 1)
        y = jnp.clip(y, 0, H - 1)

    x0c = jnp.clip(jnp.floor(x), 0, W - 1).astype(jnp.int32)
    y0c = jnp.clip(jnp.floor(y), 0, H - 1).astype(jnp.int32)

    # [B, H*W, 4C] zero-padded 2x2 patches: slots (dy,dx) = 00,01,10,11
    p = jnp.pad(image, ((0, 0), (0, 1), (0, 1), (0, 0)))
    table = jnp.stack([p[:, :H, :W], p[:, :H, 1:W + 1],
                       p[:, 1:H + 1, :W], p[:, 1:H + 1, 1:W + 1]],
                      axis=3).reshape(B, H * W, 4 * C)

    idx = (y0c * W + x0c).reshape(B, Ho * Wo, 1)
    patches = jnp.take_along_axis(table, idx, axis=1)      # [B, M, 4C]
    patches = patches.reshape(B, Ho, Wo, 4, C)

    # tent weights at the slots' true positions; clamped-away corners and
    # zero-padding corners land outside the tent and get weight 0
    px = x0c.astype(compute_dtype)
    py = y0c.astype(compute_dtype)
    wx0 = jnp.maximum(0.0, 1.0 - jnp.abs(x - px))
    wx1 = jnp.maximum(0.0, 1.0 - jnp.abs(x - (px + 1.0)))
    wy0 = jnp.maximum(0.0, 1.0 - jnp.abs(y - py))
    wy1 = jnp.maximum(0.0, 1.0 - jnp.abs(y - (py + 1.0)))
    w = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1)
    out = jnp.einsum("bhws,bhwsc->bhwc", w, patches)
    return out.astype(image.dtype) if image.dtype != compute_dtype else out


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with half-pixel centers (torch ``F.interpolate(mode=
    'bilinear', align_corners=False)``, the mode the reference uses at
    ref:modules/generator.py:55,83).

    Exact for both up- and down-scaling (torch does NOT antialias on
    downscale, unlike jax.image.resize): output pixel centers are mapped to
    input half-pixel coordinates and sampled with border clamping, which is
    precisely torch's formula.

    x: [..., H, W, C] -> [..., Ho, Wo, C].
    """
    *lead, H, W, C = x.shape
    Ho, Wo = out_hw
    if (Ho, Wo) == (H, W):
        return x
    xb = x.reshape((-1, H, W, C))
    # Output pixel centers in input pixel units, then normalized for
    # align_corners=False: norm = (2*pix + 1)/size - 1.
    xs = (jnp.arange(Wo, dtype=x.dtype) + 0.5) * (W / Wo) - 0.5
    ys = (jnp.arange(Ho, dtype=x.dtype) + 0.5) * (H / Ho) - 0.5
    gx = (2.0 * xs + 1.0) / W - 1.0
    gy = (2.0 * ys + 1.0) / H - 1.0
    grid = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), axis=-1)   # [Ho,Wo,2]
    grid = jnp.broadcast_to(grid[None], (xb.shape[0], Ho, Wo, 2))
    out = grid_sample(xb, grid, padding_mode="border", align_corners=False)
    return out.reshape(tuple(lead) + (Ho, Wo, C))


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor x2 upsample = per-pixel 2x2 repeat.

    Matches torch ``F.interpolate(scale_factor=2)`` (default mode='nearest',
    ref:modules/util.py:896).  x: [..., H, W, C].
    """
    x = jnp.repeat(x, 2, axis=-3)
    return jnp.repeat(x, 2, axis=-2)


def avg_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 average pooling, stride 2 (torch ``nn.AvgPool2d((2, 2))``,
    ref:modules/util.py:913).  Odd trailing rows/cols are dropped (torch
    floor semantics).  x: [..., H, W, C]."""
    h, w = x.shape[-3], x.shape[-2]
    lead = x.shape[:-3]
    x = x[..., : h - h % 2, : w - w % 2, :]
    xr = x.reshape(lead + (h // 2, 2, w // 2, 2, x.shape[-1]))
    return jnp.mean(xr, axis=(-4, -2))
