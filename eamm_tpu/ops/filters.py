"""One-Euro temporal filter as a `lax.scan` over the time axis.

The reference runs the filter frame-at-a-time in Python with per-frame
GPU<->CPU round trips (ref:demo.py:231-248, ref:filter1.py).  Here the whole
keypoint / pose sequence is filtered in a single fused scan on-device, so
the sequential (cheap) part never blocks the parallel (heavy) rendering.

Semantics match ref:filter1.py exactly, including the first-sample behavior
(s = x, derivative filter seeded with dx = 0).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _alpha(cutoff, freq):
    te = 1.0 / freq
    tau = 1.0 / (2.0 * jnp.pi * cutoff)
    return 1.0 / (1.0 + tau / te)


def one_euro_filter(x: jnp.ndarray, *, mincutoff: float = 1.0, beta: float = 0.0,
                    dcutoff: float = 1.0, freq: float = 30.0,
                    scale: float = 1.0) -> jnp.ndarray:
    """Filter a sequence along its leading (time) axis.

    Args:
      x: [T, ...] sequence.
      scale: values are multiplied by ``scale`` before filtering and divided
        after, reproducing the reference's ``filter(x*100)/100`` pattern
        (ref:demo.py:235-247) — the scale changes the adaptive cutoff because
        beta multiplies |dx|.

    Returns the filtered sequence, same shape/dtype as x.
    """
    xs = x * scale
    d_alpha = _alpha(jnp.asarray(dcutoff, x.dtype), freq)

    def step(carry, xt):
        prev_raw, prev_filt, prev_dfilt, started = carry
        dx = jnp.where(started, (xt - prev_raw) * freq, jnp.zeros_like(xt))
        # derivative low-pass (dx_filter): first call takes dx directly.
        edx = jnp.where(started, d_alpha * dx + (1.0 - d_alpha) * prev_dfilt, dx)
        cutoff = mincutoff + beta * jnp.abs(edx)
        a = _alpha(cutoff, freq)
        s = jnp.where(started, a * xt + (1.0 - a) * prev_filt, xt)
        return (xt, s, edx, jnp.ones_like(started)), s

    started0 = jnp.zeros(x.shape[1:], dtype=bool)
    zeros = jnp.zeros_like(xs[0])
    (_, _, _, _), ys = jax.lax.scan(step, (zeros, zeros, zeros, started0), xs)
    return ys / scale


def one_euro_filter_np(x: np.ndarray, *, mincutoff: float = 1.0,
                       beta: float = 0.0, dcutoff: float = 1.0,
                       freq: float = 30.0, scale: float = 1.0) -> np.ndarray:
    """Host (pure numpy) ``one_euro_filter`` — same semantics, for use in
    data-loading code that must never touch the device (a per-sample jax
    dispatch from a loader worker costs a tunnel round trip and couples
    CPU-side input prep to device availability)."""
    dtype = np.asarray(x).dtype
    x = np.asarray(x, np.float64)
    xs = x * scale
    te = 1.0 / freq

    def alpha(cutoff):
        return 1.0 / (1.0 + 1.0 / (2.0 * np.pi * cutoff * te))

    d_alpha = alpha(dcutoff)
    ys = np.empty_like(xs)
    prev_raw = prev_filt = prev_dfilt = None
    for t in range(xs.shape[0]):
        xt = xs[t]
        if prev_raw is None:
            edx = np.zeros_like(xt)
            s = xt
        else:
            dx = (xt - prev_raw) * freq
            edx = d_alpha * dx + (1.0 - d_alpha) * prev_dfilt
            a = alpha(mincutoff + beta * np.abs(edx))
            s = a * xt + (1.0 - a) * prev_filt
        prev_raw, prev_filt, prev_dfilt = xt, s, edx
        ys[t] = s
    return (ys / scale).astype(dtype)
