"""On-chip A/B of the decode hot-op variants (round-4 trace follow-up).

Trace finding (BASELINE.md roofline, /tmp/render_trace_r4): per 256-frame
bf16 render program, the 2x2-fold UpBlock's phase interleave costs ~59 ms
of pure data movement and the dense-motion source warp's chunked XLA
twolevel path ~42 ms (layout copies + HBM rows).  This script measures the
candidate replacements at the production chunk shapes, interleaved
best-of-N, compute only:

  * UpBlock: literal (upsample+conv3x3) vs 2x2 fold vs aligned d2s 3x3 fold
    at up0 [128,64,64,256]->128ch and up1 [128,128,128,128]->64ch.
  * dense-motion warp: XLA grid_sample (twolevel, chunked) vs
    grid_sample_smallc_pallas at src [1,64,64,3] x grids [1408,64,64,2].

Run: python benchmarks/bench_decode_ops.py  -> one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, args, n=5):
    import jax
    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(lambda a: a.block_until_ready(), out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3, out


def main():
    import jax
    import jax.numpy as jnp
    from eamm_tpu.ops.subpixel import (upsample_conv3x3_folded,
                                       upsample_conv3x3_d2s)
    from eamm_tpu.ops.warp import upsample_nearest_2x, grid_sample

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.RandomState(0)
    res = {"backend": jax.default_backend()}

    def literal(x, w):
        up = upsample_nearest_2x(x)
        dn = jax.lax.conv_dimension_numbers(up.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            up, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=dn)

    forms = {"literal": jax.jit(literal),
             "fold2x2": jax.jit(upsample_conv3x3_folded),
             "d2s3x3": jax.jit(upsample_conv3x3_d2s)}

    for name, cin, cout, hw in [("up0", 256, 128, 64),
                                ("up1", 128, 64, 128)]:
        x = jnp.asarray(rng.randn(128, hw, hw, cin), jnp.bfloat16)
        w = jnp.asarray(0.1 * rng.randn(3, 3, cin, cout), jnp.bfloat16)
        ref = None
        for fname, fn in forms.items():
            ms, out = _timed(fn, (x, w))
            res[f"{name}_{fname}_ms"] = round(ms, 2)
            o32 = np.asarray(out, np.float32)
            if ref is None:
                ref = o32
            else:
                res[f"{name}_{fname}_maxdiff"] = round(
                    float(np.abs(o32 - ref).max()), 4)

    # dense-motion source warp: 128 frames x 11 motions of one shared src
    from eamm_tpu.ops.warp_pallas import grid_sample_smallc_pallas
    src = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.bfloat16)
    grids = jnp.asarray(rng.uniform(-1.1, 1.1, (1408, 64, 64, 2)),
                        jnp.bfloat16)

    def xla_path(s, g):
        rep = jnp.broadcast_to(s, (1408,) + s.shape[1:])
        return grid_sample(rep, g)

    ms, ref_out = _timed(jax.jit(xla_path), (src, grids))
    res["dmwarp_xla_ms"] = round(ms, 2)
    ms, out = _timed(jax.jit(grid_sample_smallc_pallas), (src, grids))
    res["dmwarp_pallas_ms"] = round(ms, 2)
    res["dmwarp_maxdiff"] = round(float(np.abs(
        np.asarray(out, np.float32) - np.asarray(ref_out, np.float32)).max()), 4)

    # thin-output convs: literal vs space-to-depth grid (conv_s2d).
    # generator final 7x7 64->3 at 256^2; dense-motion mask+occlusion
    # 7x7 C->12 pair at 64^2 (fused into one conv on the s2d path).
    from eamm_tpu.ops.subpixel import conv_s2d

    def lit_conv(x, w, p):
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=((p, p), (p, p)),
            dimension_numbers=dn)

    x = jnp.asarray(rng.randn(128, 256, 256, 64), jnp.bfloat16)
    w = jnp.asarray(0.1 * rng.randn(7, 7, 64, 3), jnp.bfloat16)
    ms, ref_out = _timed(jax.jit(lambda a, b: lit_conv(a, b, 3)), (x, w))
    res["finalconv_literal_ms"] = round(ms, 2)
    ms, out = _timed(jax.jit(lambda a, b: conv_s2d(a, b, block=4)), (x, w))
    res["finalconv_s2d_ms"] = round(ms, 2)
    res["finalconv_maxdiff"] = round(float(np.abs(
        np.asarray(out, np.float32) - np.asarray(ref_out, np.float32)).max()), 4)

    x = jnp.asarray(rng.randn(256, 64, 64, 64), jnp.bfloat16)
    wm = jnp.asarray(0.1 * rng.randn(7, 7, 64, 11), jnp.bfloat16)
    wo = jnp.asarray(0.1 * rng.randn(7, 7, 64, 1), jnp.bfloat16)

    def mask_occ_literal(a, b, c):
        return lit_conv(a, b, 3), lit_conv(a, c, 3)

    def mask_occ_s2d(a, b, c):
        y = conv_s2d(a, jnp.concatenate([b, c], axis=-1), block=4)
        return y[..., :11], y[..., 11:]

    ms, ref_out = _timed(jax.jit(mask_occ_literal), (x, wm, wo))
    res["maskocc_literal_ms"] = round(ms, 2)
    ms, out = _timed(jax.jit(mask_occ_s2d), (x, wm, wo))
    res["maskocc_s2d_ms"] = round(ms, 2)
    res["maskocc_maxdiff"] = round(max(
        float(np.abs(np.asarray(out[i], np.float32)
                     - np.asarray(ref_out[i], np.float32)).max())
        for i in range(2)), 4)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
