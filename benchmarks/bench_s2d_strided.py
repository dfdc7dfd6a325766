"""A/B: conv_s2d (reshape/transpose space-to-depth + stride-1 conv) vs a
stride-`block` conv with an (k+block-1)-tap phase-expanded kernel that
performs the space-to-depth IMPLICITLY — no [B,H/b,b,W/b,b,C] transpose of
the 268 MB input (the round-5 trace's `decode/transpose` hole,
~5 ms/program at the generator final-conv shape).

out[b, bi+a, bj+e, c] = sum_{dy,dx,ci} x[b, bi+a+dy-p, bj+e+dx-p, ci] w[dy,dx,ci,c]
is, as a function of (i, j), a stride-b conv whose kernel tap t covers
phase a at t = a + dy, so W'[t, s, ci, (a,e,c)] = w[t-a, s-e, ci, c].
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def conv_s2d_strided(x, w, block=4):
    import jax
    import jax.numpy as jnp
    kh, kw, cin, cout = w.shape
    p = kh // 2
    q = kw // 2
    T = kh + block - 1
    S = kw + block - 1
    # W'[t, s, ci, a, e, c] = w[t-a, s-e, ci, c]
    wp = jnp.zeros((T, S, cin, block, block, cout), w.dtype)
    for a in range(block):
        for e in range(block):
            wp = wp.at[a:a + kh, e:e + kw, :, a, e, :].add(w)
    wp = wp.reshape(T, S, cin, block * block * cout)
    B, H, W, _ = x.shape
    dn = jax.lax.conv_dimension_numbers(x.shape, wp.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    # left pad p matches the stride-1 SAME conv; right pad kh-1-p makes the
    # output exactly H/block cells (out[i] covers x[b*i - p : b*i - p + T))
    y = jax.lax.conv_general_dilated(
        x, wp, window_strides=(block, block),
        padding=((p, kh - 1 - p), (q, kw - 1 - q)),
        dimension_numbers=dn)
    hb, wb = H // block, W // block
    y = y.reshape(B, hb, wb, block, block, cout).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, H, W, cout)


def _timed(fn, args, n=3):
    import jax
    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    np.asarray(out[:1, :2, :2])
    best = float("inf")
    for i in range(n):
        a0 = args[0] + np.float32(1e-6 * (i + 1)).astype(args[0].dtype)
        a0.block_until_ready()
        t0 = time.perf_counter()
        out = fn(a0, *args[1:])
        np.asarray(out[:1, :2, :2])
        best = min(best, time.perf_counter() - t0)
    return best * 1e3, out


def main():
    import jax
    import jax.numpy as jnp
    from eamm_tpu.ops.subpixel import conv_s2d
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.RandomState(0)
    res = {"backend": jax.default_backend()}
    # generator final conv shape: [128, 256, 256, 64] x 7x7x64x3
    x = jnp.asarray(rng.randn(128, 256, 256, 64), jnp.bfloat16)
    w = jnp.asarray(0.1 * rng.randn(7, 7, 64, 3), jnp.bfloat16)
    ms, ref = _timed(jax.jit(lambda a, b: conv_s2d(a, b, block=4)), (x, w))
    res["final_s2d_ms"] = round(ms, 2)
    ms, out = _timed(jax.jit(lambda a, b: conv_s2d_strided(a, b, 4)), (x, w))
    res["final_strided_ms"] = round(ms, 2)
    res["final_maxdiff"] = round(float(np.abs(
        np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max()), 4)

    # dense-motion mask+occlusion head shape: [256, 64, 64, 64] x 7x7x64x12
    x = jnp.asarray(rng.randn(256, 64, 64, 64), jnp.bfloat16)
    w = jnp.asarray(0.1 * rng.randn(7, 7, 64, 12), jnp.bfloat16)
    ms, ref = _timed(jax.jit(lambda a, b: conv_s2d(a, b, block=4)), (x, w))
    res["dmhead_s2d_ms"] = round(ms, 2)
    ms, out = _timed(jax.jit(lambda a, b: conv_s2d_strided(a, b, 4)), (x, w))
    res["dmhead_strided_ms"] = round(ms, 2)
    res["dmhead_maxdiff"] = round(float(np.abs(
        np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max()), 4)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
