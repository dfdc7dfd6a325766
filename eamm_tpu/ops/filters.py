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


def one_euro_init(shape, dtype=jnp.float32):
    """Fresh filter state for :func:`one_euro_filter` — ``shape`` is one
    sample's shape (the sequence shape without its leading time axis).
    The state is an ordinary pytree, so it can thread across jit boundaries
    (the streaming pipeline carries it between fixed-size chunk programs)."""
    zeros = jnp.zeros(shape, dtype)
    return (zeros, zeros, zeros, jnp.zeros(shape, dtype=bool))


def one_euro_filter(x: jnp.ndarray, *, mincutoff: float = 1.0, beta: float = 0.0,
                    dcutoff: float = 1.0, freq: float = 30.0,
                    scale: float = 1.0, carry=None,
                    return_carry: bool = False):
    """Filter a sequence along its leading (time) axis.

    Args:
      x: [T, ...] sequence.
      scale: values are multiplied by ``scale`` before filtering and divided
        after, reproducing the reference's ``filter(x*100)/100`` pattern
        (ref:demo.py:235-247) — the scale changes the adaptive cutoff because
        beta multiplies |dx|.
      carry: optional state from a previous call (:func:`one_euro_init` or a
        prior ``return_carry=True`` call).  Filtering a sequence in chunks
        with the carry threaded through is EXACTLY the whole-sequence filter
        (the scan step is identical; the state holds the raw/filtered/
        derivative values in the scaled domain).
      return_carry: also return the final state.

    Returns the filtered sequence (same shape/dtype as x), plus the final
    carry when ``return_carry``.
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

    if carry is None:
        carry = one_euro_init(x.shape[1:], xs.dtype)
    final, ys = jax.lax.scan(step, carry, xs)
    ys = ys / scale
    return (ys, final) if return_carry else ys


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
