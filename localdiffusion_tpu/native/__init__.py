"""Native host-side data kernels (C++ via ctypes, numpy fallback).

Builds libdataops.so on first use with the system g++ (cached beside the
source); every entry point has a pure-numpy fallback so the framework works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "dataops.cc")
_SO = os.path.join(_HERE, "libdataops.so")

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        # always rebuild: the .so is gitignored/untracked, and -march=native
        # makes a binary built on another host ISA-incompatible (it would
        # SIGILL at first call, past this try/except) — a fresh local build
        # is the only safe artifact; no toolchain → numpy fallback
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True,
            capture_output=True,
        )
        lib = ctypes.CDLL(_SO)
        i64 = ctypes.c_int64
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.gather_normalize_u8.argtypes = [u8p, i64p, i64, i64, ctypes.c_float, f32p]
        lib.degrade_batch_u8.argtypes = [
            u8p, i64, i64, i64, ctypes.c_int, ctypes.c_float, f32p,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def have_native() -> bool:
    return _load() is not None


def gather_normalize(
    images: np.ndarray, idx: np.ndarray, scale: float
) -> np.ndarray:
    """uint8 [N, H, W] gathered by idx → float32 [K, H, W] scaled."""
    lib = _load()
    images = np.ascontiguousarray(images, np.uint8)
    idx = np.ascontiguousarray(idx, np.int64)
    k = len(idx)
    h, w = images.shape[1:3]
    if lib is None:
        return (images[idx].astype(np.float32) * scale).reshape(k, h, w)
    out = np.empty((k, h * w), np.float32)
    lib.gather_normalize_u8(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        k, h * w, scale,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out.reshape(k, h, w)


def degrade_batch(
    images: np.ndarray, h_only: bool, scale: float
) -> np.ndarray:
    """Batch LR degradation (subsample + bilinear-up + normalize) of
    uint8 [N, H, W] → float32 [N, H, W]."""
    lib = _load()
    images = np.ascontiguousarray(images, np.uint8)
    n, h, w = images.shape
    if lib is None:
        from localdiffusion_tpu.data.mnist import degrade

        out = np.stack(
            [degrade(images[i].astype(np.float32), "h_only" if h_only else "full")
             for i in range(n)]
        )
        return out * scale
    out = np.empty((n, h, w), np.float32)
    lib.degrade_batch_u8(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, int(h_only), scale,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
