"""ctypes binding for the native (C++) batch image decoder.

``decode_batch(paths, h, w)`` decodes a list of PNGs into one float32
[N, h, w, 3] array via libeamm_native.so (libpng + worker threads, no GIL),
building the library on first use when a toolchain is present, and falling
back to imageio otherwise.  This is the TPU-era replacement for the
reference's dlib/OpenCV-through-Python decode path (SURVEY.md §2.4).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libeamm_native.so")

_lib = None
_lib_failed = False


def _load():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.eamm_decode_batch.restype = ctypes.c_int
        lib.eamm_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.eamm_decode_png.restype = ctypes.c_int
        lib.eamm_decode_png.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int]
        _lib = lib
    except Exception:
        _lib_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def decode_batch(paths: list[str], h: int, w: int,
                 n_threads: int = 4) -> np.ndarray:
    """Decode PNGs to [N, h, w, 3] float32 in [0, 1] (bilinear-resized if
    the file resolution differs)."""
    lib = _load()
    if lib is None:
        import imageio.v2 as imageio
        out = np.empty((len(paths), h, w, 3), np.float32)
        for i, p in enumerate(paths):
            img = np.asarray(imageio.imread(p))[..., :3]
            if img.ndim == 2:
                img = np.stack([img] * 3, -1)
            img = img.astype(np.float32) / 255.0
            if img.shape[:2] != (h, w):
                from eamm_tpu.data.augmentation import _bilinear_sample
                ys = (np.arange(h) + 0.5) * img.shape[0] / h - 0.5
                xs = (np.arange(w) + 0.5) * img.shape[1] / w - 0.5
                xg, yg = np.meshgrid(xs, ys)
                img = _bilinear_sample(img, xg, yg, "replicate")
            out[i] = img
        return out

    out = np.empty((len(paths), h, w, 3), np.float32)
    arr = (ctypes.c_char_p * len(paths))(
        *[p.encode() for p in paths])
    rc = lib.eamm_decode_batch(
        arr, len(paths), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w, n_threads)
    if rc != 0:
        raise IOError(f"native decode failed for {paths[rc - 1]!r}")
    return out


def _load_avi():
    global _lib
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "eamm_write_avi_rgb_pcm"):
        # stale libeamm_native.so from before the (audio-capable) AVI muxer
        # existed: rebuild once; fall back to the pure-python muxer on failure
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "clean", "all"],
                           check=True, capture_output=True)
            _lib = None
            lib = _load()
        except Exception:
            return None
        if lib is None or not hasattr(lib, "eamm_write_avi_rgb_pcm"):
            return None
    if not hasattr(lib.eamm_write_avi_rgb_pcm, "_configured"):
        u8p = ctypes.POINTER(ctypes.c_uint8)
        pcm_tail = [ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
                    ctypes.c_int, ctypes.c_int]
        lib.eamm_write_avi_rgb_pcm.restype = ctypes.c_int
        lib.eamm_write_avi_rgb_pcm.argtypes = [
            ctypes.c_char_p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int] + pcm_tail
        lib.eamm_write_avi_i420_pcm.restype = ctypes.c_int
        lib.eamm_write_avi_i420_pcm.argtypes = [
            ctypes.c_char_p, u8p, u8p, u8p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int] + pcm_tail
        lib.eamm_write_avi_rgb_pcm._configured = True
    return lib


def pcm16(audio, sample_rate: int = 16000):
    """Normalize an audio argument to (int16 [S] or [S, C] array, rate).

    Accepts int16 arrays as-is, float waveforms in [-1, 1] (the
    ``load_audio`` output), or an (array, rate) tuple."""
    if audio is None:
        return None, 0
    if isinstance(audio, tuple):
        audio, sample_rate = audio
    audio = np.asarray(audio)
    if audio.dtype != np.int16:
        audio = (np.clip(audio.astype(np.float32), -1.0, 1.0)
                 * 32767.0).round().astype(np.int16)
    return np.ascontiguousarray(audio), int(sample_rate)


def _pcm_args(pcm, rate):
    if pcm is None or pcm.size == 0:
        return None, 0, 0, 0
    channels = 1 if pcm.ndim == 1 else pcm.shape[1]
    return (pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            pcm.shape[0], rate, channels)


def _fps_rational(fps: float) -> tuple[int, int]:
    return max(1, int(round(fps * 1000))), 1000


def _py_avi(path, n, w, h, fps, frame_size, bit_count, compression,
            handler, frames_iter, pcm=None, sample_rate=0):
    """Pure-python AVI muxer (same wire format as native/avi_writer.cc,
    incl. the interleaved PCM 'auds' stream); fallback when the C++
    library cannot build."""
    import struct
    num, den = _fps_rational(fps)
    avih, strh = 56, 56
    strl_vid = 4 + 8 + strh + 8 + 40
    have_audio = pcm is not None and pcm.size > 0
    channels = 0 if not have_audio else (1 if pcm.ndim == 1 else pcm.shape[1])
    ba = channels * 2
    hdrl = 4 + 8 + avih + 8 + strl_vid
    if have_audio:
        strl_aud = 4 + 8 + strh + 8 + 16
        hdrl += 8 + strl_aud
        n_samples = pcm.shape[0]
        cuts = [min(i * sample_rate * den // num, n_samples)
                for i in range(n)] + [n_samples]
        aud_bytes = [(cuts[i + 1] - cuts[i]) * ba for i in range(n)]
    else:
        aud_bytes = [0] * n
    movi = 4 + n * (8 + frame_size) + sum(8 + b for b in aud_bytes if b)
    idx1 = (n + sum(1 for b in aud_bytes if b)) * 16
    riff = 4 + 8 + hdrl + 8 + movi + 8 + idx1
    with open(path, "wb") as f:
        w32 = lambda *v: f.write(struct.pack("<" + "I" * len(v), *v))
        f.write(b"RIFF"); w32(riff); f.write(b"AVI ")
        f.write(b"LIST"); w32(hdrl); f.write(b"hdrl")
        f.write(b"avih"); w32(avih, 1000000 * den // num, frame_size * num // den,
                              0, 0x110 if have_audio else 0x10, n, 0,
                              2 if have_audio else 1,
                              frame_size, w, h, 0, 0, 0, 0)
        f.write(b"LIST"); w32(strl_vid); f.write(b"strl")
        f.write(b"strh"); w32(strh); f.write(b"vids"); f.write(handler)
        w32(0, 0, 0, den, num, 0, n, frame_size, 0xFFFFFFFF, 0)
        f.write(struct.pack("<4H", 0, 0, w, h))
        f.write(b"strf"); w32(40, 40, w, h)
        f.write(struct.pack("<2H", 1, bit_count))
        w32(compression, frame_size, 0, 0, 0, 0)
        if have_audio:
            f.write(b"LIST"); w32(strl_aud); f.write(b"strl")
            f.write(b"strh"); w32(strh); f.write(b"auds")
            w32(0, 0, 0, 0, 1, sample_rate, 0, n_samples,
                max(aud_bytes), 0xFFFFFFFF, ba)
            f.write(struct.pack("<4H", 0, 0, 0, 0))
            f.write(b"strf"); w32(16)
            f.write(struct.pack("<2H", 1, channels))
            w32(sample_rate, sample_rate * ba)
            f.write(struct.pack("<2H", ba, 16))
        f.write(b"LIST"); w32(movi); f.write(b"movi")
        for i, data in enumerate(frames_iter):
            f.write(b"00db"); w32(frame_size); f.write(data)
            if have_audio and aud_bytes[i]:
                f.write(b"01wb"); w32(aud_bytes[i])
                f.write(pcm[cuts[i]:cuts[i + 1]].tobytes())
        f.write(b"idx1"); w32(idx1)
        off = 4
        for i in range(n):
            f.write(b"00db"); w32(0x10, off, frame_size)
            off += 8 + frame_size
            if have_audio and aud_bytes[i]:
                f.write(b"01wb"); w32(0x10, off, aud_bytes[i])
                off += 8 + aud_bytes[i]
    return path


def write_avi_rgb(path: str, frames: np.ndarray, fps: float = 25.0,
                  audio=None, sample_rate: int = 16000) -> str:
    """Mux [N, H, W, 3] uint8 RGB frames into an uncompressed DIB AVI
    (playable without any codec).  Native C++ when available, pure-python
    fallback with the identical wire format otherwise.  ``audio`` (float
    waveform in [-1, 1], int16 PCM, or an (array, rate) tuple) adds an
    interleaved 16-bit 'auds' stream — the ffmpeg-free replacement for the
    reference's audio remux (ref:demo.py:427-431)."""
    frames = np.ascontiguousarray(frames, np.uint8)
    n, h, w = frames.shape[:3]
    pcm, rate = pcm16(audio, sample_rate)
    lib = _load_avi()
    if lib is not None:
        num, den = _fps_rational(fps)
        rc = lib.eamm_write_avi_rgb_pcm(
            path.encode(), frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, w, h, num, den, *_pcm_args(pcm, rate))
        if rc != 0:
            raise IOError(f"native AVI write failed ({rc}) for {path!r}")
        return path
    stride = (w * 3 + 3) & ~3
    def gen():
        pad = np.zeros((h, stride - w * 3), np.uint8)
        for fr in frames:
            bgr = fr[::-1, :, ::-1]                    # bottom-up BGR
            yield np.concatenate(
                [bgr.reshape(h, w * 3), pad], axis=1).tobytes()
    return _py_avi(path, n, w, h, fps, stride * h, 24, 0, b"DIB ", gen(),
                   pcm, rate)


def write_avi_i420(path: str, y: np.ndarray, u: np.ndarray, v: np.ndarray,
                   fps: float = 25.0, audio=None,
                   sample_rate: int = 16000) -> str:
    """Mux yuv420p planes (the pipeline's ``transfer_format='yuv420'``
    output: y [N,H,W], u/v [N,H/2,W/2] uint8) into an 'I420' AVI — a
    straight plane copy, zero host-side pixel conversion.  ``audio`` as in
    :func:`write_avi_rgb`."""
    y = np.ascontiguousarray(y, np.uint8)
    u = np.ascontiguousarray(u, np.uint8)
    v = np.ascontiguousarray(v, np.uint8)
    n, h, w = y.shape
    if h % 2 or w % 2:
        raise ValueError(f"I420 needs even dimensions, got {h}x{w}")
    pcm, rate = pcm16(audio, sample_rate)
    lib = _load_avi()
    if lib is not None:
        num, den = _fps_rational(fps)
        ptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        rc = lib.eamm_write_avi_i420_pcm(path.encode(), ptr(y), ptr(u),
                                         ptr(v), n, w, h, num, den,
                                         *_pcm_args(pcm, rate))
        if rc != 0:
            raise IOError(f"native AVI write failed ({rc}) for {path!r}")
        return path
    fourcc = int.from_bytes(b"I420", "little")
    def gen():
        for i in range(n):
            yield y[i].tobytes() + u[i].tobytes() + v[i].tobytes()
    return _py_avi(path, n, w, h, fps, w * h * 3 // 2, 12, fourcc,
                   b"I420", gen(), pcm, rate)
