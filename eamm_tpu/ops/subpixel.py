"""Subpixel (folded) nearest-upsample convolution.

The decode stack's UpBlocks compute ``conv3x3(nearest_up_2x(x))``
(ref:modules/util.py:883-900).  Nearest upsampling duplicates every pixel
into a 2x2 block, so the 3x3 conv at the doubled resolution multiplies each
distinct input pixel by *sums* of kernel taps — per output-parity phase
(a, b) in {0,1}^2 only TWO distinct input rows/cols are read:

    a=0: up rows (2i-1, 2i, 2i+1) -> x rows (i-1, i, i)   taps (w0, w1+w2)
    a=1: up rows (2i,  2i+1, 2i+2) -> x rows (i, i, i+1)  taps (w0+w1, w2)

Folding the taps gives an EXACT reformulation: one VALID 2x2 convolution
over the 1-padded input producing ``4*C_out`` channels on an (H+1, W+1)
grid, whose four phase blocks are interleaved back to (2H, 2W) with a
one-pixel offset per phase (phase (a, b) reads grid position (i+a, j+b)).

Why this is the TPU-native form (BASELINE.md inference roofline, round-3
kernel win #2 "fold frames into channels" — folding *phases* into channels
is the shape-preserving variant that needs no BN-stat surgery):

  * FLOPs drop 9/4 = 2.25x — the original conv re-multiplies every
    duplicated pixel; the fold multiplies each distinct pixel once per
    folded tap (2x2 window x 4 phases = 16 taps per 4 outputs vs 9 taps
    per output).
  * The MXU contraction is ``2*2*C_in`` and the output dim ``4*C_out`` —
    for the generator's production decode (C_out 128/64) that turns
    64-lane outputs into 512/256-lane outputs at a quarter of the spatial
    positions: large, aligned matmuls instead of thin ones.
  * It runs at the LOW resolution; only the final elementwise BN/ReLU and
    the pure-data-movement interleave touch the doubled grid.

Exactness: the only arithmetic change is pre-summing adjacent kernel taps
(w1+w2) in f32 instead of summing their products inside the conv —
reassociation at the 1-ulp level.  ``UpBlock`` therefore uses this path for
ALL eval-mode calls (training keeps the literal form: batch-norm statistics
are computed from conv outputs, and the fold's (H+1, W+1) intermediate is
not where those stats are defined).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# Row-fold matrices f[a] : taps (3,) -> folded taps (2,) per output parity.
#   a=0 reads x rows (i-1, i) with weights (w0, w1+w2)
#   a=1 reads x rows (i, i+1) with weights (w0+w1, w2)
_FOLD = np.asarray(
    [[[1.0, 0.0, 0.0], [0.0, 1.0, 1.0]],
     [[1.0, 1.0, 0.0], [0.0, 0.0, 1.0]]], np.float32)    # [a, r, p]

# Aligned (depth-to-space) fold: the same per-phase 2-tap weights embedded
# in a 3-row kernel so EVERY phase reads the same SAME-padded input window
# (i-1, i, i+1) at position i — the phase offset moves from the output
# indexing (a slice/concat/shift chain in XLA) into structured kernel
# zeros.  FLOPs return to the literal 3x3 count, but the conv runs at the
# LOW resolution with 4*C_out lanes and the interleave collapses to one
# depth-to-space transpose.
_FOLD_D2S = np.asarray(
    [[[1.0, 0.0, 0.0], [0.0, 1.0, 1.0], [0.0, 0.0, 0.0]],
     [[0.0, 0.0, 0.0], [1.0, 1.0, 0.0], [0.0, 0.0, 1.0]]], np.float32)


def fold_upsample_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, C_in, C_out] HWIO kernel -> [2, 2, C_in, 4*C_out] folded
    kernel whose output channel blocks are the (a, b) phases, phase-major
    (block index 2a+b)."""
    f = jnp.asarray(_FOLD, w.dtype)
    w2 = jnp.einsum("arp,bsq,pqio->rsiabo", f, f, w)
    return w2.reshape(2, 2, w.shape[2], 4 * w.shape[3])


def upsample_conv3x3_folded(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """``conv3x3_pad1(nearest_up_2x(x))`` computed as one folded 2x2 VALID
    conv at the input resolution + phase interleave.

    x: [B, H, W, C_in]; w: [3, 3, C_in, C_out] HWIO.  Returns
    [B, 2H, 2W, C_out] (no bias — the caller adds it; a bias is
    phase-invariant so it commutes with the interleave).
    """
    B, H, W, _ = x.shape
    C = w.shape[-1]
    w2 = fold_upsample_kernel(w)
    z = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dn = jax.lax.conv_dimension_numbers(z.shape, w2.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(z, w2, window_strides=(1, 1),
                                     padding="VALID", dimension_numbers=dn)
    y = y.reshape(B, H + 1, W + 1, 4, C)
    # phase (a, b) lives at grid position (i+a, j+b)
    t = jnp.stack([y[:, :H, :W, 0], y[:, :H, 1:, 1],
                   y[:, 1:, :W, 2], y[:, 1:, 1:, 3]], axis=3)
    t = t.reshape(B, H, W, 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    return t.reshape(B, 2 * H, 2 * W, C)


def _s2d_fold(kernel: int, pad: int, block: int):
    """Indicator fold tensor for expressing a stride-1 conv on the
    space-to-depth input grid.

    ``F[a, R, u, r] = 1`` iff output phase ``a`` (row offset within an
    output block), original tap ``r`` reads the input row at relative
    block ``R`` (offset so R >= 0), within-block offset ``u``.  Returns
    ``(F, (pad_lo, pad_hi))`` where the pads are whole input *blocks*.
    Every entry of the original kernel is copied (not summed) into the
    folded kernel, so the reformulation is exact up to the contraction
    accumulating extra structural zeros.
    """
    tmin = -pad
    tmax = block - 1 + kernel - 1 - pad
    rmin, rmax = tmin // block, tmax // block
    F = np.zeros((block, rmax - rmin + 1, block, kernel), np.float32)
    for a in range(block):
        for r in range(kernel):
            t = a + r - pad
            F[a, t // block - rmin, t % block, r] = 1.0
    return F, (-rmin, rmax)


def fold_conv_kernel_s2d(w: jnp.ndarray, block: int,
                         pad: int | None = None):
    """[kh, kw, C_in, C_out] HWIO kernel -> space-to-depth folded kernel
    ``[Kh, Kw, block^2*C_in, block^2*C_out]`` plus block-pad amounts."""
    kh, kw, cin, cout = w.shape
    pad_r = kh // 2 if pad is None else pad
    pad_c = kw // 2 if pad is None else pad
    Fr, pads_r = _s2d_fold(kh, pad_r, block)
    Fc, pads_c = _s2d_fold(kw, pad_c, block)
    f_r = jnp.asarray(Fr, w.dtype)
    f_c = jnp.asarray(Fc, w.dtype)
    w2 = jnp.einsum("aRur,eScs,rsio->RSuciaeo", f_r, f_c, w)
    Kh, Kw = Fr.shape[1], Fc.shape[1]
    return (w2.reshape(Kh, Kw, block * block * cin, block * block * cout),
            pads_r, pads_c)


def conv_s2d(x: jnp.ndarray, w: jnp.ndarray, block: int = 4,
             pad: int | None = None) -> jnp.ndarray:
    """Stride-1 SAME conv with a *thin* output computed on the
    space-to-depth grid: ``[B,H,W,Cin] -> [B,H/b,W/b,b^2*Cin]`` conv
    ``-> [B,H/b,W/b,b^2*Cout]`` -> depth-to-space ``[B,H,W,Cout]``.

    The generator's final 7x7 conv maps 64 channels to 3 at 256^2
    (ref:modules/generator.py:30,92): as written its MXU matmul is
    [65536 rows x 3136] with THREE output lanes of the MXU's 128 — at
    block=4 the same conv becomes [4096 rows x 9216] with 48 output
    lanes, ~5x fewer row*contraction cycles, and every original tap is
    copied (not summed) into the folded kernel, so the only numeric
    change is the contraction accumulating structural zeros.  Worth it
    only when C_out is far below the 128-lane width; wide convs lose
    (the folded kernel is block^2 times larger in both channel dims).
    """
    B, H, W, cin = x.shape
    cout = w.shape[-1]
    if H % block or W % block:
        raise ValueError(f"spatial dims {(H, W)} not divisible by {block}")
    w2, (plo_r, phi_r), (plo_c, phi_c) = fold_conv_kernel_s2d(w, block, pad)
    hb, wb = H // block, W // block
    z = x.reshape(B, hb, block, wb, block, cin)
    z = z.transpose(0, 1, 3, 2, 4, 5).reshape(B, hb, wb,
                                              block * block * cin)
    dn = jax.lax.conv_dimension_numbers(z.shape, w2.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        z, w2, window_strides=(1, 1),
        padding=((plo_r, phi_r), (plo_c, phi_c)), dimension_numbers=dn)
    y = y.reshape(B, hb, wb, block, block, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, H, W, cout)


def conv_s2d_strided(x: jnp.ndarray, w: jnp.ndarray,
                     block: int = 4) -> jnp.ndarray:
    """Stride-1 SAME thin-output conv as ONE stride-``block`` conv with an
    (k+block-1)-tap phase-expanded kernel — the space-to-depth happens
    IMPLICITLY in the conv's stride, so the [B,H/b,b,W/b,b,C] input
    rearrange that ``conv_s2d`` pays (a layout-hostile transpose of the
    full activation, ~5 ms/program at the generator final-conv shape in
    the round-5 trace) never exists.

    Derivation: out[b*i+a, b*j+e, c] = sum_{dy,dx} x[b*i+a+dy-p, ...]
    w[dy,dx] is, as a function of (i, j), a stride-b conv whose kernel tap
    t covers phase a at t = a+dy: W'[t,s,ci,(a,e,c)] = w[t-a,s-e,ci,c],
    window (k+b-1)^2, padding (p, k-1-p).  The structural zeros make the
    contraction ~(1+ (b-1)/k)^2 x the literal FLOPs, which the wide-lane
    stride-b matmul more than buys back at 256^2 (measured on the v5e:
    30.7 ms vs 33.4 conv_s2d vs 42.2 literal per 128-frame chunk at the
    7x7 64->3 shape; at 64^2 heads the transpose is small and conv_s2d
    stays faster — benchmarks/bench_s2d_strided.py).  Exact up to tap-sum
    reassociation.  SAME padding only.
    """
    kh, kw, cin, cout = w.shape
    p, q = kh // 2, kw // 2
    T, S = kh + block - 1, kw + block - 1
    wp = jnp.zeros((T, S, cin, block, block, cout), w.dtype)
    for a in range(block):
        for e in range(block):
            wp = wp.at[a:a + kh, e:e + kw, :, a, e, :].add(w)
    wp = wp.reshape(T, S, cin, block * block * cout)
    B, H, W, _ = x.shape
    if H % block or W % block:
        raise ValueError(f"spatial dims {(H, W)} not divisible by {block}")
    dn = jax.lax.conv_dimension_numbers(x.shape, wp.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, wp, window_strides=(block, block),
        padding=((p, kh - 1 - p), (q, kw - 1 - q)), dimension_numbers=dn)
    hb, wb = H // block, W // block
    y = y.reshape(B, hb, wb, block, block, cout).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, H, W, cout)


def fold_upsample_kernel_d2s(w: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, C_in, C_out] HWIO kernel -> [3, 3, C_in, 4*C_out] aligned
    (depth-to-space) folded kernel, phase-major output blocks (2a+b)."""
    f = jnp.asarray(_FOLD_D2S, w.dtype)
    w3 = jnp.einsum("arp,bsq,pqio->rsiabo", f, f, w)
    return w3.reshape(3, 3, w.shape[2], 4 * w.shape[3])


def upsample_conv3x3_d2s(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """``conv3x3_pad1(nearest_up_2x(x))`` as one SAME 3x3 conv at the input
    resolution with ``4*C_out`` phase channels + a single depth-to-space.

    Trades the 2x2 fold's 2.25x FLOP saving for a structurally trivial
    interleave: the 4 phase blocks land at the SAME grid position, so the
    epilogue is one [B,H,W,2,2,C]->[B,2H,2W,C] transpose instead of the
    slice/concat/shift chain ``upsample_conv3x3_folded`` needs (measured
    ~59 ms of pure data movement per 256-frame render program on v5e).
    MACs equal the literal form's, but run at the LOW resolution with
    4*C_out output lanes — MXU-aligned where the literal's C_out-lane
    256^2 conv is not — and the 2H x 2W nearest-upsampled input is never
    materialized.  Exact up to the same tap-sum reassociation.
    """
    B, H, W, _ = x.shape
    C = w.shape[-1]
    w3 = fold_upsample_kernel_d2s(w)
    dn = jax.lax.conv_dimension_numbers(x.shape, w3.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, w3, window_strides=(1, 1),
                                     padding=((1, 1), (1, 1)),
                                     dimension_numbers=dn)
    y = y.reshape(B, H, W, 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, 2 * H, 2 * W, C)
