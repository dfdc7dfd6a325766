"""Device-side training augmentation.

The reference augments clips on the host per sample (torchvision-style
ColorJitter + flips, ref:augmentation.py:295-430) — per-pixel float math on
the training thread.  On this framework the production input path ships raw
uint8 frames (4x fewer host->device bytes, zero host pixel math) and the
jitted train step converts and augments on device, where the elementwise
chain fuses into the first conv's input pipeline for free.

Factors are sampled on the HOST per sample (`ColorJitter.sample_factors` —
keeps the reference's RNG semantics and distribution) and ride the batch as
a tiny ``jitter_factors [B, 4]`` array; the heavy per-pixel work runs here.

Semantics match `data.augmentation.ColorJitter.apply_factors` exactly
(tested in tests/test_ops_augment.py): brightness scale -> contrast about
the per-frame mean -> saturation about ITU-R 601 luma -> YIQ hue rotation
-> clip to [0, 1].
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# ITU-R 601 luma weights and the RGB->YIQ basis (ref ColorJitter/_shift_hue)
_LUMA = np.array([0.299, 0.587, 0.114], np.float32)
_TO_YIQ = np.array([[0.299, 0.587, 0.114],
                    [0.596, -0.274, -0.322],
                    [0.211, -0.523, 0.312]], np.float64)


def _hue_matrix(hshift):
    """[..., 3, 3] RGB-space hue-rotation matrix for shift (turns)."""
    theta = 2.0 * jnp.pi * hshift
    c, s = jnp.cos(theta), jnp.sin(theta)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    rot = jnp.stack([
        jnp.stack([one, zero, zero], -1),
        jnp.stack([zero, c, -s], -1),
        jnp.stack([zero, s, c], -1),
    ], -2)
    to_yiq = jnp.asarray(_TO_YIQ, rot.dtype)
    from_yiq = jnp.asarray(np.linalg.inv(_TO_YIQ), rot.dtype)
    return from_yiq @ rot @ to_yiq


def color_jitter(clip, b, c, s, hshift):
    """Jitter [..., T, H, W, 3] frames with per-clip factors.

    b/c/s/hshift broadcast against the leading axes (pass [B, 1, 1, 1, 1]
    for a [B, T, H, W, 3] batch).  Identity factors (1, 1, 1, 0) reproduce
    the input exactly (up to f32 rounding of the pass-through terms).
    """
    x = clip * b
    mean = x.mean(axis=(-3, -2, -1), keepdims=True)      # per-frame scalar
    x = (x - mean) * c + mean
    gray = x @ jnp.asarray(_LUMA, x.dtype)
    x = (x - gray[..., None]) * s + gray[..., None]
    h = jnp.asarray(hshift, x.dtype)
    # the 3x3 matrix supplies the channel dims itself: drop the factor's
    # channel-alignment axis when it was broadcast-shaped like the clip
    m = _hue_matrix(h[..., 0] if h.ndim == x.ndim else h)
    x = jnp.einsum("...c,...dc->...d", x, m)
    return jnp.clip(x, 0.0, 1.0)


def decode_and_augment(batch: dict) -> dict:
    """Device-side input processing for a training batch.

    - uint8 image streams -> float32 in [0, 1] (the production upload
      format; exact for PNG-sourced pixels),
    - ``flip_time`` / ``flip_h`` per-sample flags -> clip reversal
      (RandomFlip semantics: time flip excludes horizontal),
    - ``jitter_factors [B, 4]`` -> per-sample color jitter on ``driving``
      (the reference augments only the driving stream,
      ref:frames_dataset.py:162-163).

    Returns a new dict without the augmentation keys; a batch with none of
    them passes through unchanged, so the same step function serves host-
    augmented float batches and device-augmented uint8 batches.
    """
    out = dict(batch)
    for k in ("example_image", "driving", "transformed_driving"):
        if k in out and out[k].dtype == jnp.uint8:
            out[k] = out[k].astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    ft = out.pop("flip_time", None)
    fh = out.pop("flip_h", None)
    fac = out.pop("jitter_factors", None)
    if ft is not None:
        d = out["driving"]
        out["driving"] = jnp.where(
            ft.reshape((-1,) + (1,) * (d.ndim - 1)) > 0, d[:, ::-1], d)
    if fh is not None:
        d = out["driving"]
        out["driving"] = jnp.where(
            fh.reshape((-1,) + (1,) * (d.ndim - 1)) > 0, d[..., ::-1, :], d)
    if fac is not None:
        d = out["driving"]
        bc = (slice(None),) + (None,) * (d.ndim - 1)
        out["driving"] = color_jitter(d, fac[:, 0][bc], fac[:, 1][bc],
                                      fac[:, 2][bc], fac[:, 3][bc])
    return out
