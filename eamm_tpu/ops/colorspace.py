"""RGB <-> YUV 4:2:0 (BT.601 full-range / JPEG) conversion.

Why this exists: the delivered product of the inference pipeline is a video,
and every consumer mp4 stores yuv420p (12 bits/pixel).  Converting on the
TPU and shipping yuv420 planes halves the device->host bytes relative to
RGB uint8 with *zero additional loss* for the video path — the encoder
would perform exactly this conversion anyway.  On remote-attached TPU
runtimes the host link is the throughput bottleneck for whole-clip
rendering (measured ~30 MB/s here), so this is the single biggest
performance lever for delivered frames/sec.

The reference ships full RGB frames from GPU to host per frame
(ref:demo.py:279-281) and converts in the encoder; we fold the conversion
into the render program where it fuses with the final sigmoid for free.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# BT.601 full-range (JPEG) coefficients.
_KR, _KG, _KB = 0.299, 0.587, 0.114


def rgb_to_yuv420(pred: jnp.ndarray):
    """[T, H, W, 3] float RGB in [0, 1] -> (Y [T,H,W], U, V [T,H/2,W/2]) uint8.

    Chroma is 2x2 box-filtered (the standard 4:2:0 siting used by swscale's
    default).  Jittable; fuses into the producing program.
    """
    r, g, b = pred[..., 0], pred[..., 1], pred[..., 2]
    y = _KR * r + _KG * g + _KB * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b      # in [-0.5, 0.5]
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b
    H, W = cb.shape[-2:]
    lead = cb.shape[:-2]
    cb = cb.reshape(lead + (H // 2, 2, W // 2, 2)).mean(axis=(-3, -1))
    cr = cr.reshape(lead + (H // 2, 2, W // 2, 2)).mean(axis=(-3, -1))

    def q(x, offset=0.0):
        return jnp.clip(jnp.round(x * 255.0 + offset), 0, 255).astype(jnp.uint8)

    return q(y), q(cb, 128.0), q(cr, 128.0)


def pack_yuv420_np(frames: np.ndarray) -> np.ndarray:
    """Host-side: [N, H, W, 3] float RGB in [0, 1] -> ONE packed uint8
    plane array [N, 3H/2, W] (Y rows 0:H; U|V side by side in rows H:3H/2)
    — the i420 framing at 12 bits/pixel, HALF the host->device bytes of
    uint8 RGB.  Same BT.601 math and 2x2 chroma box filter as
    :func:`rgb_to_yuv420`, so the loss equals what the lossy (yuv420)
    delivery path already accepts."""
    f = np.asarray(frames, np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = _KR * r + _KG * g + _KB * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b
    N, H, W = y.shape
    cb = cb.reshape(N, H // 2, 2, W // 2, 2).mean(axis=(2, 4))
    cr = cr.reshape(N, H // 2, 2, W // 2, 2).mean(axis=(2, 4))

    def q(x, offset=0.0):
        return np.clip(np.round(x * 255.0 + offset), 0, 255).astype(np.uint8)

    out = np.empty((N, H + H // 2, W), np.uint8)
    out[:, :H] = q(y)
    out[:, H:, :W // 2] = q(cb, 128.0)
    out[:, H:, W // 2:] = q(cr, 128.0)
    return out


def unpack_yuv420(packed: jnp.ndarray) -> jnp.ndarray:
    """Device-side inverse of :func:`pack_yuv420_np` (nearest chroma
    upsample, matching the host ``yuv420_to_rgb``): packed uint8
    [N, 3H/2, W] -> float RGB [N, H, W, 3] in [0, 1].  Jittable; fuses
    into the consuming program."""
    Hp, W = packed.shape[-2:]
    H = (Hp * 2) // 3
    y = packed[:, :H].astype(jnp.float32)
    u = packed[:, H:, :W // 2].astype(jnp.float32) - 128.0
    v = packed[:, H:, W // 2:].astype(jnp.float32) - 128.0

    def up(c):
        return jnp.repeat(jnp.repeat(c, 2, axis=-2), 2, axis=-1)

    uf, vf = up(u), up(v)
    rgb = jnp.stack([y + 1.402 * vf,
                     y - 0.344136 * uf - 0.714136 * vf,
                     y + 1.772 * uf], axis=-1)
    return jnp.clip(rgb, 0.0, 255.0) * jnp.float32(1.0 / 255.0)


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Host-side inverse (nearest chroma upsample) -> uint8 RGB [.., H, W, 3].

    Uses torch when importable (multithreaded ufuncs); numpy otherwise.
    Exact inverse of :func:`rgb_to_yuv420` up to uint8 quantization and the
    4:2:0 chroma subsampling (the same loss the video codec imposes).
    """
    try:
        import torch

        def t(a):
            a = np.ascontiguousarray(a)
            if not a.flags.writeable:
                a = a.copy()
            return torch.from_numpy(a).float()

        yf = t(y)
        uf = t(u) - 128.0
        vf = t(v) - 128.0
        uf = uf.repeat_interleave(2, dim=-2).repeat_interleave(2, dim=-1)
        vf = vf.repeat_interleave(2, dim=-2).repeat_interleave(2, dim=-1)
        r = yf + 1.402 * vf
        g = yf - 0.344136 * uf - 0.714136 * vf
        b = yf + 1.772 * uf
        out = torch.stack([r, g, b], dim=-1).clamp_(0, 255)
        return out.to(torch.uint8).numpy()
    except ImportError:
        yf = y.astype(np.float32)
        uf = (u.astype(np.float32) - 128.0).repeat(2, axis=-2).repeat(2, axis=-1)
        vf = (v.astype(np.float32) - 128.0).repeat(2, axis=-2).repeat(2, axis=-1)
        out = np.stack([yf + 1.402 * vf,
                        yf - 0.344136 * uf - 0.714136 * vf,
                        yf + 1.772 * uf], axis=-1)
        np.clip(out, 0, 255, out=out)
        return out.astype(np.uint8)
