"""Micro-A/B of grid_sample_twolevel_pallas variants at the production
bottleneck-warp shape (image [1,64,64,256] bf16, grid [128,64,64,2] — one
128-frame chunk of the render program's wide warp, ~24 ms/program in the
round-5 trace = 10.4% of device time).

Variants:
- current: tile=128, f32 rows intermediate (8 MB VMEM)
- rows-bf16 + tile=256: halves the rows intermediate so a 2x output tile
  fits VMEM — amortizes the K=64 MXU weight fill over twice the rows
- rows-bf16 + tile=512
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _twolevel_kernel_b16(fy_ref, fx_ref, src_ref, out_ref, *, H, W, C):
    tile = fy_ref.shape[2]
    i = pl.program_id(1)
    fy = fy_ref[0, i, :]
    fx = fx_ref[0, i, :]
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (tile, H), 1)
    ty = jnp.maximum(0.0, 1.0 - jnp.abs(fy[:, None] - row_idx.astype(fy.dtype)))
    rows = jnp.dot(ty.astype(src_ref.dtype), src_ref[0],
                   preferred_element_type=jnp.float32
                   ).astype(jnp.bfloat16)                   # [tile, W*C] bf16
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (tile, W), 1)
    tx = jnp.maximum(0.0, 1.0 - jnp.abs(fx[:, None] - col_idx.astype(fx.dtype)))
    acc = jnp.zeros((tile, C), jnp.float32)
    for w in range(W):
        acc = acc + tx[:, w][:, None] * rows[:, w * C:(w + 1) * C].astype(
            jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile",))
def twolevel_b16(image, grid, tile=256):
    Bi, H, W, C = image.shape
    B, Ho, Wo, _ = grid.shape
    P = Ho * Wo
    from eamm_tpu.ops.warp import _unnormalize
    g32 = grid.astype(jnp.float32)
    fx = _unnormalize(g32[..., 0], W, False).reshape(B, P)
    fy = _unnormalize(g32[..., 1], H, False).reshape(B, P)
    pad = (-P) % tile
    if pad:
        fx = jnp.pad(fx, ((0, 0), (0, pad)), constant_values=-10.0)
        fy = jnp.pad(fy, ((0, 0), (0, pad)), constant_values=-10.0)
    n_tiles = (P + pad) // tile
    kernel = functools.partial(_twolevel_kernel_b16, H=H, W=W, C=C)
    group = B // Bi
    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, n_tiles, tile), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tiles, tile), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W * C), lambda b, i: (b // group, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P + pad, C), image.dtype),
    )(fy.reshape(B, n_tiles, tile), fx.reshape(B, n_tiles, tile),
      image.reshape(Bi, H, W * C))
    return out[:, :P].reshape(B, Ho, Wo, C)


def _timed(fn, args, n=3):
    out = fn(*args)
    np.asarray(out[:1, :2, :2])
    best = float("inf")
    for i in range(n):
        g = args[1] + jnp.bfloat16(1e-3 * (i + 1))
        g.block_until_ready()
        t0 = time.perf_counter()
        out = fn(args[0], g)
        np.asarray(out[:1, :2, :2])
        best = min(best, time.perf_counter() - t0)
    return best * 1e3, out


def main():
    from eamm_tpu.ops.warp_pallas import grid_sample_twolevel_pallas
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.rand(1, 64, 64, 256), jnp.bfloat16)
    grid = jnp.asarray(rng.uniform(-1.05, 1.05, (128, 64, 64, 2)),
                       jnp.bfloat16)
    res = {"backend": jax.default_backend()}
    ms, ref = _timed(jax.jit(grid_sample_twolevel_pallas), (src, grid))
    res["current_tile128_ms"] = round(ms, 2)
    for tile in (256, 512):
        try:
            ms, out = _timed(
                jax.jit(functools.partial(twolevel_b16, tile=tile)),
                (src, grid))
            res[f"b16rows_tile{tile}_ms"] = round(ms, 2)
            res[f"b16rows_tile{tile}_maxdiff"] = round(float(np.abs(
                np.asarray(out, np.float32)
                - np.asarray(ref, np.float32)).max()), 4)
        except Exception as e:
            res[f"b16rows_tile{tile}_error"] = str(e)[:200]
    print(json.dumps(res))


if __name__ == "__main__":
    main()
