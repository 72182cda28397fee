"""ctypes bindings for the native C++ host data path (native/boda_native.cc).

Auto-builds ``native/libboda_native.so`` on first use (g++, links system
libjpeg). All entry points have pure-python fallbacks in their callers; use
``native_available()`` to gate.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO = os.path.join(_NATIVE_DIR, "libboda_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < \
            os.path.getmtime(os.path.join(_NATIVE_DIR, "boda_native.cc")):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    c_u8p = ctypes.POINTER(ctypes.c_uint8)
    c_f32p = ctypes.POINTER(ctypes.c_float)
    c_f64p = ctypes.POINTER(ctypes.c_double)
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    lib.bn_jpeg_decode.restype = ctypes.c_int
    lib.bn_jpeg_decode.argtypes = [c_u8p, ctypes.c_int64, c_u8p, c_i64p,
                                   c_i64p, ctypes.c_char_p, ctypes.c_int64]
    lib.bn_resize_bilinear_rgba.restype = None
    lib.bn_resize_bilinear_rgba.argtypes = [c_u8p, ctypes.c_int64,
                                            ctypes.c_int64, c_u8p,
                                            ctypes.c_int64, ctypes.c_int64]
    lib.bn_rgba_to_nchw_bgr.restype = None
    lib.bn_rgba_to_nchw_bgr.argtypes = [c_u8p, ctypes.c_int64, ctypes.c_int64,
                                        ctypes.c_int64, c_f32p, ctypes.c_float,
                                        c_f32p]
    lib.bn_f32_stats.restype = None
    lib.bn_f32_stats.argtypes = [c_f32p, ctypes.c_int64, c_f64p]
    lib.bn_loader_create.restype = ctypes.c_void_p
    lib.bn_loader_create.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                     ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_int, ctypes.c_int]
    lib.bn_loader_next.restype = ctypes.c_int64
    lib.bn_loader_next.argtypes = [ctypes.c_void_p, c_u8p]
    lib.bn_loader_error.restype = None
    lib.bn_loader_error.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_int64]
    lib.bn_loader_destroy.restype = None
    lib.bn_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode JPEG bytes -> (y, x, 4) uint8 RGBA via libjpeg."""
    lib = get_lib()
    assert lib is not None
    buf = np.frombuffer(data, np.uint8)
    y = ctypes.c_int64()
    x = ctypes.c_int64()
    err = ctypes.create_string_buffer(256)
    rc = lib.bn_jpeg_decode(_u8p(buf), len(data), None,
                            ctypes.byref(y), ctypes.byref(x), err, 256)
    if rc:
        raise ValueError(f"jpeg decode failed: {err.value.decode()}")
    out = np.empty((y.value, x.value, 4), np.uint8)
    rc = lib.bn_jpeg_decode(_u8p(buf), len(data), _u8p(out),
                            ctypes.byref(y), ctypes.byref(x), err, 256)
    if rc:
        raise ValueError(f"jpeg decode failed: {err.value.decode()}")
    return out


def resize_bilinear(rgba: np.ndarray, dy: int, dx: int) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    rgba = np.ascontiguousarray(rgba)
    out = np.empty((dy, dx, 4), np.uint8)
    lib.bn_resize_bilinear_rgba(_u8p(rgba), rgba.shape[0], rgba.shape[1],
                                _u8p(out), dy, dx)
    return out


def rgba_to_nchw_bgr(rgba: np.ndarray, mean_bgr=(104.0, 117.0, 123.0),
                     scale: float = 1.0) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    rgba = np.ascontiguousarray(rgba)
    n, y, x = rgba.shape[:3]
    out = np.empty((n, 3, y, x), np.float32)
    mean = np.asarray(mean_bgr, np.float32)
    lib.bn_rgba_to_nchw_bgr(_u8p(rgba), n, y, x,
                            mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                            scale,
                            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def f32_stats(v: np.ndarray) -> tuple[float, float, float, float]:
    lib = get_lib()
    assert lib is not None
    v = np.ascontiguousarray(v, np.float32).reshape(-1)
    out = np.zeros(4, np.float64)
    lib.bn_f32_stats(v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), v.size,
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return tuple(out)


class BatchLoader:
    """Threaded native jpeg->resize->RGBA-batch prefetcher."""

    def __init__(self, paths: list[str], batch: int, y: int, x: int,
                 n_threads: int = 2, loop: bool = False):
        lib = get_lib()
        assert lib is not None
        self._lib = lib
        if n_threads <= 0:
            n_threads = os.cpu_count() or 4
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._h = lib.bn_loader_create(arr, len(paths), batch, y, x,
                                       n_threads, int(loop))
        self.batch, self.y, self.x = batch, y, x

    def next(self) -> Optional[tuple[int, np.ndarray]]:
        out = np.empty((self.batch, self.y, self.x, 4), np.uint8)
        bi = self._lib.bn_loader_next(self._h, _u8p(out))
        if bi == -1:
            return None
        if bi == -2:
            err = ctypes.create_string_buffer(256)
            self._lib.bn_loader_error(self._h, err, 256)
            raise RuntimeError(f"batch loader: {err.value.decode()}")
        return int(bi), out

    def close(self) -> None:
        if self._h:
            self._lib.bn_loader_destroy(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
