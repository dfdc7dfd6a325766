"""Fused keypoint-expectation kernel.

The keypoint heads (ref:modules/keypoint_detector.py:40-50,96-103 semantics,
implemented in eamm_tpu/models/kp_detector.py) turn a raw [B, K, h, w] conv
map into

  * ``value``    [B, K, 2]    — spatial softmax -> grid-weighted soft-argmax
  * ``jacobian`` [B, K, 2, 2] — the same softmax weighting four more maps

As separate XLA ops this is ~15 small HLOs per stage (softmax max/sub/exp/
sum/div + six weighted reductions), each a [B*K, h*w] pass too small to fill
the MXU and too light to saturate HBM — a top occupancy hole in the render
program (BASELINE.md inference roofline, kernel win #1).  The Pallas kernel
below reads each heatmap row ONCE into VMEM, computes the softmax and all
six expectations in registers, and writes 8 floats per row: one HLO, one
HBM pass over the prediction and jacobian maps.

The grid coordinates are not materialized: pixel p of a row maps to
(x, y) = (p % w, p // w) on the align-corners [-1, 1]^2 grid
(ref:modules/util.py:839-855), generated in-kernel from an iota.

``kp_expectation`` is a ``jax.custom_vjp``: the forward picks the Pallas
kernel on TPU (XLA elsewhere), the backward differentiates the XLA
reference implementation — training paths (which also need the heatmap for
the part1 mimic loss) stay exact and differentiable everywhere.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from eamm_tpu.ops.grid import heatmap_softmax, gaussian2kp

_LANES = 128
_TN = 64  # rows (keypoints) per Pallas program
_INTERPRET = False  # tests flip this to exercise the kernel off-TPU


def _xla_impl(pred: jnp.ndarray, jmap: jnp.ndarray, temperature: float):
    """Reference implementation: [B,K,h,w] + [B,K,4,h,w] -> value/jacobian."""
    heat = heatmap_softmax(pred, temperature)
    value = gaussian2kp(heat)
    jac = jnp.sum(heat[:, :, None] * jmap, axis=(-2, -1))
    B, K = pred.shape[:2]
    return value, jac.reshape(B, K, 2, 2)


def _kernel(pred_ref, jmap_ref, out_ref, *, p_raw, w, h, inv_temp):
    pred = pred_ref[:]                                        # [TN, P]
    P = pred.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (_TN, P), 1)
    logits = jnp.where(col < p_raw, pred * inv_temp, -1e30)
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    heat = e / jnp.sum(e, axis=1, keepdims=True)              # [TN, P]
    xf = (col % w).astype(jnp.float32)
    yf = (col // w).astype(jnp.float32)
    gx = 2.0 * xf / (w - 1) - 1.0
    gy = 2.0 * yf / (h - 1) - 1.0
    cols = [jnp.sum(heat * gx, axis=1), jnp.sum(heat * gy, axis=1)]
    for f in range(4):
        cols.append(jnp.sum(heat * jmap_ref[f], axis=1))
    cols += [jnp.zeros((_TN,), jnp.float32)] * 2
    out_ref[:] = jnp.stack(cols, axis=1)                      # [TN, 8]


def _pallas_impl(pred: jnp.ndarray, jmap: jnp.ndarray, temperature: float):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, K, h, w = pred.shape
    p_raw = h * w
    P = -(-p_raw // _LANES) * _LANES
    N = B * K
    Np = -(-N // _TN) * _TN
    pred_f = pred.astype(jnp.float32).reshape(N, p_raw)
    pred_f = jnp.pad(pred_f, ((0, Np - N), (0, P - p_raw)))
    jmap_f = jmap.astype(jnp.float32).reshape(N, 4, p_raw)
    jmap_f = jnp.pad(jmap_f, ((0, Np - N), (0, 0), (0, P - p_raw)))
    jmap_f = jnp.moveaxis(jmap_f, 1, 0)                       # [4, Np, P]

    kernel = functools.partial(_kernel, p_raw=p_raw, w=w, h=h,
                               inv_temp=float(1.0 / temperature))
    out = pl.pallas_call(
        kernel,
        grid=(Np // _TN,),
        in_specs=[
            pl.BlockSpec((_TN, P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _TN, P), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TN, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, 8), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=12 * Np * P, transcendentals=Np * P,
            bytes_accessed=5 * Np * P * 4),
        interpret=_INTERPRET,
    )(pred_f, jmap_f)
    value = out[:N, :2].reshape(B, K, 2).astype(pred.dtype)
    jac = out[:N, 2:6].reshape(B, K, 2, 2).astype(jmap.dtype)
    return value, jac


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def kp_expectation(pred: jnp.ndarray, jmap: jnp.ndarray, temperature: float):
    """Fused softmax-expectation head: pred [B,K,h,w], jmap [B,K,4,h,w] ->
    (value [B,K,2], jacobian [B,K,2,2]).  Pallas on TPU, XLA elsewhere."""
    if jax.default_backend() == "tpu" or _INTERPRET:
        return _pallas_impl(pred, jmap, temperature)
    return _xla_impl(pred, jmap, temperature)


def _fwd(pred, jmap, temperature):
    return kp_expectation(pred, jmap, temperature), (pred, jmap)


def _bwd(temperature, res, g):
    pred, jmap = res
    _, vjp = jax.vjp(lambda p, j: _xla_impl(p, j, temperature), pred, jmap)
    return vjp(g)


kp_expectation.defvjp(_fwd, _bwd)
