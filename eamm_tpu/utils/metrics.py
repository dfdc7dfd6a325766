"""Image/video quality metrics for the evaluation protocols.

The reference repo reports no quantitative metrics (its run.py imports a
``reconstruction`` module that does not exist — SURVEY.md §5.1); the FOMM
evaluation convention for this model family is per-frame L1 plus PSNR, SSIM
and AKD (average keypoint distance between ground truth and reconstruction).
All metrics here are jittable jax ops over [T,H,W,C] float clips in [0,1].

SSIM follows Wang et al. 2004 with the standard 11x11 Gaussian window
(sigma 1.5) and K1=0.01 / K2=0.03 on a dynamic range of 1.0.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def psnr(pred: jnp.ndarray, target: jnp.ndarray,
         max_val: float = 1.0) -> jnp.ndarray:
    """Mean PSNR (dB) over the leading (frame) axis of [T,H,W,C] clips."""
    mse = jnp.mean((pred - target) ** 2, axis=(-3, -2, -1))
    mse = jnp.maximum(mse, 1e-12)
    return jnp.mean(10.0 * jnp.log10(max_val ** 2 / mse))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _window_mean(x: jnp.ndarray, win: np.ndarray) -> jnp.ndarray:
    """Separable depthwise Gaussian filtering of [T,H,W,C] (valid padding)."""
    C = x.shape[-1]
    kh = jnp.asarray(win).reshape(len(win), 1, 1, 1)
    kh = jnp.broadcast_to(kh, (len(win), 1, 1, C))
    kw = jnp.asarray(win).reshape(1, len(win), 1, 1)
    kw = jnp.broadcast_to(kw, (1, len(win), 1, C))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=C)
    return jax.lax.conv_general_dilated(y, kw, (1, 1), "VALID",
                                        dimension_numbers=dn,
                                        feature_group_count=C)


def ssim(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0,
         window_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM over [T,H,W,C] clips (single scale, Gaussian window)."""
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    win = _gaussian_window(window_size, sigma)
    mu_p = _window_mean(pred, win)
    mu_t = _window_mean(target, win)
    mu_pp, mu_tt, mu_pt = mu_p * mu_p, mu_t * mu_t, mu_p * mu_t
    sigma_p = _window_mean(pred * pred, win) - mu_pp
    sigma_t = _window_mean(target * target, win) - mu_tt
    sigma_pt = _window_mean(pred * target, win) - mu_pt
    num = (2 * mu_pt + c1) * (2 * sigma_pt + c2)
    den = (mu_pp + mu_tt + c1) * (sigma_p + sigma_t + c2)
    return jnp.mean(num / den)


def average_keypoint_distance(kp_pred: jnp.ndarray,
                              kp_target: jnp.ndarray) -> jnp.ndarray:
    """AKD: mean L2 between matching keypoints, [T,K,2] in [-1,1] coords."""
    return jnp.mean(jnp.linalg.norm(kp_pred - kp_target, axis=-1))


def clip_metrics(pred, target, kp_pred=None, kp_target=None) -> dict:
    """L1 / PSNR / SSIM (and AKD when keypoints given) as python floats."""
    pred = jnp.asarray(pred, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    out = {"l1": float(jnp.mean(jnp.abs(pred - target))),
           "psnr": float(psnr(pred, target)),
           "ssim": float(ssim(pred, target))}
    if kp_pred is not None and kp_target is not None:
        out["akd"] = float(average_keypoint_distance(
            jnp.asarray(kp_pred), jnp.asarray(kp_target)))
    return out
