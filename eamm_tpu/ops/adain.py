"""Adaptive instance normalization helpers (ref:modules/function.py:12-75).

NHWC layout: instance statistics are per-sample, per-channel over (H, W).
"""
from __future__ import annotations

import jax.numpy as jnp


def calc_mean_std(feat: jnp.ndarray, eps: float = 1e-5):
    """feat: [B, H, W, C] -> (mean, std) each [B, 1, 1, C]."""
    mean = jnp.mean(feat, axis=(1, 2), keepdims=True)
    var = jnp.var(feat, axis=(1, 2), keepdims=True)
    return mean, jnp.sqrt(var + eps)


def adaptive_instance_normalization(content: jnp.ndarray,
                                    style: jnp.ndarray) -> jnp.ndarray:
    """Normalize content's instance stats to style's."""
    c_mean, c_std = calc_mean_std(content)
    s_mean, s_std = calc_mean_std(style)
    return (content - c_mean) / c_std * s_std + s_mean


def coral(source: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Color-distribution transfer (CORAL): whiten source channel stats and
    re-color with target's covariance (ref:modules/function.py:36-75).

    source/target: [H, W, 3] in [0, 1].
    """
    def flat(x):
        return x.reshape(-1, 3).T                       # [3, N]

    def norm(x):
        mean = jnp.mean(x, axis=1, keepdims=True)
        std = jnp.std(x, axis=1, keepdims=True) + 1e-8
        return (x - mean) / std, mean, std

    src, _, _ = norm(flat(source))
    tgt, t_mean, t_std = norm(flat(target))
    cov_s = src @ src.T + jnp.eye(3)
    cov_t = tgt @ tgt.T + jnp.eye(3)

    def msqrt(m):
        vals, vecs = jnp.linalg.eigh(m)
        return vecs @ jnp.diag(jnp.sqrt(jnp.maximum(vals, 0))) @ vecs.T

    def msqrt_inv(m):
        vals, vecs = jnp.linalg.eigh(m)
        return vecs @ jnp.diag(1.0 / jnp.sqrt(jnp.maximum(vals, 1e-8))) @ vecs.T

    transfer = msqrt(cov_t) @ msqrt_inv(cov_s) @ src
    out = transfer * t_std + t_mean
    return out.T.reshape(source.shape)
