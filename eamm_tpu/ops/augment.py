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
import jax
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
    return _apply_mead_augmentation(out)


def warp_homography_frames(frames, minv, padding_mode: str,
                           out_hw: tuple[int, int] | None = None):
    """Warp [B, T, H, W, C] frames by per-frame homographies.

    minv: [B, T, 3, 3] or [B, 1, 3, 3] DST->SRC matrices (the host passes
    ``inv(M)`` precomputed in f64, matching
    ``data.augmentation.warp_homography``'s cv2 convention).
    padding_mode: 'zeros' (constant-0 border) | 'border' (replicate).
    out_hw: output size (defaults to the input size; the host pipeline's
    perspective warp emits a fixed 256x256, mirroring the reference).
    Dispatches through ``ops.warp.grid_sample``, i.e. the gather-free
    tent-matmul / patch-table fast paths apply.
    """
    from eamm_tpu.ops.warp import grid_sample
    B, T, H, W, C = frames.shape
    Ho, Wo = out_hw or (H, W)
    m = jnp.broadcast_to(minv, (B, T, 3, 3)).reshape(B * T, 3, 3)
    m = m.astype(frames.dtype)
    f = frames.reshape(B * T, H, W, C)
    xs = jnp.arange(Wo, dtype=frames.dtype)
    ys = jnp.arange(Ho, dtype=frames.dtype)
    X, Y = jnp.meshgrid(xs, ys)                       # [Ho, Wo]
    pts = jnp.stack([X, Y, jnp.ones_like(X)], 0).reshape(3, -1)
    src = jnp.einsum("nij,jp->nip", m, pts)           # [N, 3, Ho*Wo]
    sx = src[:, 0] / src[:, 2]
    sy = src[:, 1] / src[:, 2]
    # source pixel coords -> align_corners=True normalized coords
    gx = (2.0 * sx / (W - 1) - 1.0).reshape(B * T, Ho, Wo)
    gy = (2.0 * sy / (H - 1) - 1.0).reshape(B * T, Ho, Wo)
    grid = jnp.stack([gx, gy], -1)
    out = grid_sample(f, grid, padding_mode=padding_mode,
                      align_corners=True)
    return out.reshape(B, T, Ho, Wo, C)


def _apply_mead_augmentation(out: dict) -> dict:
    """Build ``transformed_driving`` on device from the clean ``driving``
    stream + per-clip decisions (``tdrv_*`` keys), in the host pipeline's
    fixed order: mouth-noise -> flip -> rotation -> perspective -> jitter
    (ref:augmentation.py:408-430).  The transformed stream never crosses
    the host link at all — only the tiny decision arrays do."""
    tdrv = {k: out.pop(k) for k in list(out) if k.startswith("tdrv_")}
    if not tdrv:
        return out
    x = out["driving"]
    noise = tdrv.get("tdrv_mouth_noise")
    if noise is not None:
        rect = tdrv["tdrv_mouth_rect"]                # [B, 2] = (y0, x0)
        nf = noise.astype(x.dtype) * jnp.asarray(1.0 / 255.0, x.dtype)

        def put(frames, block, yx):
            return jax.lax.dynamic_update_slice(
                frames, block, (0, yx[0], yx[1], 0))

        x = jax.vmap(put)(x, nf, rect)
    ft, fh = tdrv.get("tdrv_flip_time"), tdrv.get("tdrv_flip_h")
    if ft is not None:
        bc = (slice(None),) + (None,) * (x.ndim - 1)
        x = jnp.where(ft[bc] > 0, x[:, ::-1], x)
        x = jnp.where(fh[bc] > 0, x[..., ::-1, :], x)
    rot = tdrv.get("tdrv_rot_minv")                   # [B, 3, 3]
    if rot is not None:
        x = warp_homography_frames(x, rot[:, None], "zeros")
    pers = tdrv.get("tdrv_pers_minv")                 # [B, T, 3, 3]
    if pers is not None:
        # the host/reference perspective warp emits a fixed 256x256
        # regardless of input size (ref:augmentation.py RandomPerspective)
        x = warp_homography_frames(x, pers, "border", out_hw=(256, 256))
    fac = tdrv.get("tdrv_jitter")
    if fac is not None:
        bc = (slice(None),) + (None,) * (x.ndim - 1)
        x = color_jitter(x, fac[:, 0][bc], fac[:, 1][bc],
                         fac[:, 2][bc], fac[:, 3][bc])
    out["transformed_driving"] = x
    return out
