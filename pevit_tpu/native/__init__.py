"""Native (C++) host data plane: ctypes bindings with on-demand build.

The shared library compiles lazily with g++ the first time it's requested
(cached next to the source); consumers fall back to PIL when no compiler is
available.  See image_ops.cpp for the algorithm notes.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "image_ops.cpp")
_SO = os.path.join(_DIR, "_image_ops.so")
_LOCK = threading.Lock()
_LIB = None
_FAILED = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-funroll-loops", "-shared", "-fPIC", "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # pragma: no cover
        logging.warning("native image_ops build failed (%s); falling back to PIL", e)
        return False


def get_lib():
    """The loaded ctypes library, or None when unavailable."""
    global _LIB, _FAILED
    if _LIB is not None or _FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _FAILED = True
                return None
        lib = ctypes.CDLL(_SO)
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.resize_center_crop_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int]
        lib.resize_center_crop_batch_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int
        ]
        lib.resize_bicubic_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int, ctypes.c_int]
        _LIB = lib
        return _LIB


def native_resize_center_crop(img: np.ndarray, size: int) -> np.ndarray:
    """uint8 HWC -> (size, size, C) uint8; raises if the lib is unavailable."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native image_ops unavailable")
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    out = np.empty((size, size, c), np.uint8)
    lib.resize_center_crop_u8(img, h, w, c, out, size)
    return out


def native_resize_center_crop_batch(imgs: np.ndarray, size: int) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native image_ops unavailable")
    imgs = np.ascontiguousarray(imgs, np.uint8)
    n, h, w, c = imgs.shape
    out = np.empty((n, size, size, c), np.uint8)
    lib.resize_center_crop_batch_u8(imgs, n, h, w, c, out, size)
    return out
