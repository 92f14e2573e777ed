"""ctypes bindings for the native C++ host data path (native/ofd_native.cpp).

Builds the shared library on first use (g++ is in the image) and caches it
next to the source; every entry point has a pure-python/numpy fallback, so
the framework works without a compiler too.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SRC = _NATIVE_DIR / "ofd_native.cpp"
_LIB = _NATIVE_DIR / "libofd_native.so"

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("OFD_DISABLE_NATIVE"):
        return None
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB)],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(_LIB))
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.bilinear_resize.argtypes = [f32p] + [ctypes.c_int] * 3 + [f32p] + [ctypes.c_int] * 2
        lib.box_downsample.argtypes = [f32p] + [ctypes.c_int] * 4 + [f32p]
        lib.decode_flo.argtypes = [
            u8p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_void_p,
        ]
        lib.decode_flo.restype = ctypes.c_int
        lib.artificial_sample.argtypes = [ctypes.c_int] * 8 + [f32p] * 3
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _build() is not None


def bilinear_resize(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    img = np.ascontiguousarray(img, np.float32)
    h, w, c = img.shape
    lib = _build()
    if lib is None:
        ys = np.clip((np.arange(oh) + 0.5) * h / oh - 0.5, 0, h - 1)
        xs = np.clip((np.arange(ow) + 0.5) * w / ow - 0.5, 0, w - 1)
        y0 = np.floor(ys).astype(int); x0 = np.floor(xs).astype(int)
        y1 = np.minimum(y0 + 1, h - 1); x1 = np.minimum(x0 + 1, w - 1)
        wy = (ys - y0)[:, None, None]; wx = (xs - x0)[None, :, None]
        top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
        bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
        return (top * (1 - wy) + bot * wy).astype(np.float32)
    out = np.empty((oh, ow, c), np.float32)
    lib.bilinear_resize(img, h, w, c, out, oh, ow)
    return out


def box_downsample(img: np.ndarray, factor: int) -> np.ndarray:
    img = np.ascontiguousarray(img, np.float32)
    h, w, c = img.shape
    lib = _build()
    if lib is None:
        return img.reshape(h // factor, factor, w // factor, factor, c).mean((1, 3))
    out = np.empty((h // factor, w // factor, c), np.float32)
    lib.box_downsample(img, h, w, c, factor, out)
    return out


def decode_flo(data: bytes) -> np.ndarray:
    lib = _build()
    if lib is None:
        from .flow_io import read_flo
        import io, tempfile

        buf = np.frombuffer(data, np.uint8)
        magic = np.frombuffer(data[:4], np.float32)[0]
        assert abs(float(magic) - 202021.25) < 1e-3
        w, h = np.frombuffer(data[4:12], np.int32)
        return np.frombuffer(data[12 : 12 + h * w * 8], np.float32).reshape(h, w, 2)
    buf = np.frombuffer(data, np.uint8)
    w = ctypes.c_int(); h = ctypes.c_int()
    rc = lib.decode_flo(buf, len(data), ctypes.byref(w), ctypes.byref(h), None)
    assert rc == 0, f"bad .flo ({rc})"
    out = np.empty((h.value, w.value, 2), np.float32)
    rc = lib.decode_flo(
        buf, len(data), ctypes.byref(w), ctypes.byref(h),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    assert rc == 0
    return out


def artificial_sample(S, y0, x0, hh, ww, fy, fx, checkers) -> tuple:
    lib = _build()
    if lib is None:
        return None
    first = np.empty((S, S, 3), np.float32)
    second = np.empty((S, S, 3), np.float32)
    flow = np.empty((S, S, 2), np.float32)
    lib.artificial_sample(
        int(S), int(y0), int(x0), int(hh), int(ww), int(fy), int(fx),
        int(checkers), first, second, flow,
    )
    return first, second, flow


__all__ = [
    "available", "bilinear_resize", "box_downsample", "decode_flo",
    "artificial_sample",
]
