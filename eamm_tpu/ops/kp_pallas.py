"""Fused keypoint-expectation Pallas kernel.

The keypoint head turns a [B, K, 58, 58] conv output into keypoints: a
temperature softmax over the 58x58 map, a grid-weighted soft-argmax for the
(x, y) expectation, and a heatmap-weighted reduction of the 4 per-pixel
Jacobian entries (ref:modules/keypoint_detector.py:40-50,96-103 semantics,
implemented across eamm_tpu/ops/grid.py and models/kp_detector.py).

Composed in XLA this is ~15 small HLOs per stage (reduce-max, subtract,
exp, reduce-sum, divide, six weighted reduce-sums, reshapes).  This kernel
does the whole chain in ONE pass over VMEM-resident tiles: each grid step
loads a tile of rows (one row = one (batch, keypoint) heatmap flattened to
58*58 = 3364 lanes, padded to 3456), computes the stable softmax on the
VPU, and reduces the six expectations (grid-x, grid-y, four Jacobian
entries) without the intermediate heatmap ever visiting HBM.  When the
caller needs the normalized heatmap itself (the training loss does;
inference drops it) a second variant also writes it out.

MEASURED SLOWER — kept as a reference, NOT wired into the models (the
same status as ``ops/warp.py::grid_sample_shared``).  Round-4 scan-
amortized timing on the v5e (50 iterations inside one program, clip-sized
inputs [256, 10, 58, 58]): the fused kernel runs ~2x slower than the XLA
composition, and the whole kp-expectation chain costs only ~1 ms of the
~274 ms bf16 whole-clip render program — XLA already fuses the chain into
a handful of fusions whose launch overhead is negligible at clip batch
sizes.  The roofline's "fuse the kp chain" hypothesis (BASELINE.md) did
not survive measurement; the render program's occupancy gap lives in the
conv stack, not here.

Inference-only: no custom VJP is defined — training keeps the XLA
composition, whose backward pass XLA fuses well.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eamm_tpu.ops.grid import make_coordinate_grid

_LANE = 128
_NEG = -1e9        # pad logit: exp((_NEG - m)/t) == 0 for any real m


def _kernel(pred_ref, jmap_ref, gxy_ref, out_ref, hm_ref=None, *,
            inv_temp: float):
    p = pred_ref[:].astype(jnp.float32)                       # [T, Pp]
    m = jnp.max(p, axis=-1, keepdims=True)
    e = jnp.exp((p - m) * inv_temp)                           # pads -> 0
    z = jnp.sum(e, axis=-1, keepdims=True)
    hm = e / z
    if hm_ref is not None:
        hm_ref[:] = hm.astype(hm_ref.dtype)
    gx = gxy_ref[0:1, :]                                      # [1, Pp]
    gy = gxy_ref[1:2, :]
    tile, Pp = p.shape
    j = jmap_ref[:].astype(jnp.float32).reshape(tile, 4, Pp)  # [T, 4, Pp]
    vx = jnp.sum(hm * gx, axis=-1)
    vy = jnp.sum(hm * gy, axis=-1)
    jac = jnp.sum(hm[:, None, :] * j, axis=-1)                # [T, 4]
    out_ref[:] = jnp.concatenate(
        [vx[:, None], vy[:, None], jac,
         jnp.zeros((tile, 2), jnp.float32)], axis=-1)         # [T, 8]


def _pad_last(x, to):
    pad = to - x.shape[-1]
    if pad:
        cfg = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
        x = jnp.pad(x, cfg)
    return x


@functools.partial(jax.jit, static_argnames=("temperature", "want_heatmap",
                                             "tile", "interpret"))
def kp_expectation_fused(prediction: jnp.ndarray, jmap: jnp.ndarray,
                         temperature: float, want_heatmap: bool = False,
                         tile: int = 32, interpret: bool = False):
    """Softmax + soft-argmax + Jacobian expectation in one Pallas pass.

    prediction: [B, K, h, w] raw kp-conv logits.
    jmap:       [B, K, 4, h, w] per-pixel Jacobian entries (the
                single-jacobian-map variant must be broadcast by the caller).
    Returns (value [B,K,2] f32, jacobian [B,K,2,2] f32,
             heatmap [B,K,h,w] or None).
    """
    B, K, h, w = prediction.shape
    assert jmap.shape == (B, K, 4, h, w), jmap.shape
    P = h * w
    Pp = -(-P // _LANE) * _LANE
    R = B * K
    Rp = -(-R // tile) * tile

    pred = _pad_last(prediction.reshape(R, P), Pp)
    if Pp > P:
        # pad columns with a very negative logit so softmax ignores them
        mask = jnp.arange(Pp) < P
        pred = jnp.where(mask[None, :], pred, jnp.asarray(_NEG, pred.dtype))
    jm = _pad_last(jmap.reshape(R, 4, P), Pp).reshape(R, 4 * Pp)
    if Rp > R:
        pred = jnp.pad(pred, ((0, Rp - R), (0, 0)),
                       constant_values=jnp.asarray(_NEG, pred.dtype))
        jm = jnp.pad(jm, ((0, Rp - R), (0, 0)))

    grid = make_coordinate_grid(h, w).reshape(P, 2).T          # [2, P]
    gxy = _pad_last(jnp.concatenate(
        [grid, jnp.zeros((6, P), jnp.float32)], axis=0), Pp)   # [8, Pp]

    kernel = functools.partial(_kernel, inv_temp=1.0 / temperature)
    out_shapes = [jax.ShapeDtypeStruct((Rp, 8), jnp.float32)]
    out_specs = [pl.BlockSpec((tile, 8), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    if want_heatmap:
        out_shapes.append(jax.ShapeDtypeStruct((Rp, Pp), prediction.dtype))
        out_specs.append(pl.BlockSpec((tile, Pp), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))

    res = pl.pallas_call(
        kernel,
        grid=(Rp // tile,),
        in_specs=[
            pl.BlockSpec((tile, Pp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 4 * Pp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Pp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if want_heatmap else out_specs[0],
        out_shape=out_shapes if want_heatmap else out_shapes[0],
        interpret=interpret,
    )(pred, jm, gxy)

    packed = res[0] if want_heatmap else res
    packed = packed[:R]
    value = packed[:, :2].reshape(B, K, 2)
    jacobian = packed[:, 2:6].reshape(B, K, 2, 2)
    heatmap = None
    if want_heatmap:
        heatmap = res[1][:R, :P].reshape(B, K, h, w)
    return value, jacobian, heatmap
