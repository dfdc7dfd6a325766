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
