"""ctypes bindings for the native (C++) augmentation kernels.

First-party replacement for the OpenCV C++ kernels the reference drives
(SURVEY.md §2.5). Auto-builds the shared library on first use if a
compiler is available; everything degrades gracefully to the numpy/cv2
paths in data/preprocess.py when it isn't.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "_native")
_SO = os.path.join(_DIR, "libaugment.so")
_lib = None


def _build() -> bool:
    src = os.path.join(_DIR, "augment.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _SO, src],
            check=True, capture_output=True)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and not _build():
        return None
    lib = ctypes.CDLL(_SO)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i = ctypes.c_int
    lib.resize_bilinear_u8.argtypes = [u8p, i, i, i, u8p, i, i]
    lib.resize_nearest_u8.argtypes = [u8p, i, i, i, u8p, i, i]
    lib.mirror_u8.argtypes = [u8p, i, i, i, u8p]
    lib.crop_pad_normalize.argtypes = [u8p, i, i, i, i, i, i, i,
                                       f32p, f32p, f32p]
    lib.crop_pad_u8.argtypes = [u8p, i, i, i, i, i, i,
                                ctypes.c_uint8, u8p]
    _lib = lib
    return lib


def available() -> bool:
    return get_lib() is not None


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize_bilinear_u8(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    lib = get_lib()
    img = np.ascontiguousarray(img, np.uint8)
    c = img.shape[2] if img.ndim == 3 else 1
    out = np.empty((dh, dw, c) if img.ndim == 3 else (dh, dw), np.uint8)
    lib.resize_bilinear_u8(_u8(img), img.shape[0], img.shape[1], c,
                           _u8(out), dh, dw)
    return out


def resize_nearest_u8(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    lib = get_lib()
    img = np.ascontiguousarray(img, np.uint8)
    c = img.shape[2] if img.ndim == 3 else 1
    out = np.empty((dh, dw, c) if img.ndim == 3 else (dh, dw), np.uint8)
    lib.resize_nearest_u8(_u8(img), img.shape[0], img.shape[1], c,
                          _u8(out), dh, dw)
    return out


def mirror_u8(img: np.ndarray) -> np.ndarray:
    lib = get_lib()
    img = np.ascontiguousarray(img, np.uint8)
    c = img.shape[2] if img.ndim == 3 else 1
    out = np.empty_like(img)
    lib.mirror_u8(_u8(img), img.shape[0], img.shape[1], c, _u8(out))
    return out


def crop_pad_normalize(img: np.ndarray, pos_y: int, pos_x: int,
                       ch: int, cw: int, mean: Sequence[float],
                       std: Sequence[float]) -> np.ndarray:
    lib = get_lib()
    img = np.ascontiguousarray(img, np.uint8)
    c = img.shape[2]
    out = np.empty((ch, cw, c), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib.crop_pad_normalize(_u8(img), img.shape[0], img.shape[1], c,
                           pos_y, pos_x, ch, cw, _f32(mean), _f32(std),
                           _f32(out))
    return out


def crop_pad_u8(img: np.ndarray, pos_y: int, pos_x: int, ch: int, cw: int,
                pad: int = 255) -> np.ndarray:
    lib = get_lib()
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty((ch, cw), np.uint8)
    lib.crop_pad_u8(_u8(img), img.shape[0], img.shape[1], pos_y, pos_x,
                    ch, cw, pad, _u8(out))
    return out
