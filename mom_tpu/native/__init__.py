"""On-demand-compiled native runtime (ctypes).  Every entry point has a pure
Python fallback; `available()` reports whether the shared library loaded."""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "build", "libmomnative.so")
_LIB = None
_TRIED = False


def _compile() -> bool:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    src = os.path.join(_HERE, "momnative.cpp")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", src,
           "-o", _SO, "-lpng", "-lz", "-pthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        print(f"momnative: compile failed ({e}); using python fallbacks",
              file=sys.stderr, flush=True)
        return False


def _lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(_HERE, "momnative.cpp")
    if not os.path.exists(_SO) or (os.path.exists(src) and
                                   os.path.getmtime(src) > os.path.getmtime(_SO)):
        if not _compile():
            return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.ply_write.restype = ctypes.c_int
        lib.ply_write.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_float),
                                  ctypes.c_int64, ctypes.c_int64]
        lib.png_write_batch.restype = ctypes.c_int
        lib.png_write_batch.argtypes = [ctypes.c_char_p,
                                        ctypes.POINTER(ctypes.c_ubyte),
                                        ctypes.c_int, ctypes.c_int,
                                        ctypes.c_int, ctypes.c_int]
        lib.knn3_morton.restype = None
        lib.knn3_morton.argtypes = [ctypes.POINTER(ctypes.c_float),
                                    ctypes.c_int64, ctypes.c_int,
                                    ctypes.POINTER(ctypes.c_float)]
        _LIB = lib
    except OSError as e:
        print(f"momnative: load failed ({e}); using python fallbacks",
              file=sys.stderr, flush=True)
    return _LIB


def available() -> bool:
    return _lib() is not None


def ply_write(path: str, header: str, data: np.ndarray) -> bool:
    """data: (N, n_cols) float32 C-contiguous. Returns True on success."""
    lib = _lib()
    if lib is None:
        return False
    data = np.ascontiguousarray(data, np.float32)
    rc = lib.ply_write(path.encode(), header.encode(),
                       data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                       data.shape[0], data.shape[1])
    return rc == 0


def png_write_batch(paths: list[str], frames: np.ndarray,
                    n_threads: int = 8) -> bool:
    """frames: (N, H, W, 3) uint8."""
    lib = _lib()
    if lib is None:
        return False
    frames = np.ascontiguousarray(frames, np.uint8)
    n, h, w, _ = frames.shape
    blob = b"".join(p.encode() + b"\0" for p in paths)
    rc = lib.png_write_batch(blob,
                             frames.ctypes.data_as(
                                 ctypes.POINTER(ctypes.c_ubyte)),
                             n, w, h, n_threads)
    return rc == 0


def knn3_morton(points: np.ndarray, window: int = 24) -> np.ndarray | None:
    lib = _lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty(pts.shape[0], np.float32)
    lib.knn3_morton(pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    pts.shape[0], window,
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
