"""ctypes bindings for the native host-ops library (native/hostops.cpp).

The C++ library does the per-pixel host work of the real-data pipeline
(batched affine warp + blur + color jitter + normalization) across a
thread pool — the role torch DataLoader's C++ workers play for the
reference. Falls back to the cv2/numpy path when the library has not
been built (``make -C native``); builds it on the fly when a compiler
is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from artiboost_tpu.utils.logger import logger

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libhostops.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src_dir = os.path.join(os.path.dirname(__file__), "..", "..", "native")
    try:
        subprocess.run(["make", "-C", src_dir], check=True,
                       capture_output=True, timeout=120)
        return os.path.isfile(_LIB_PATH)
    except Exception as e:  # no compiler / make failure
        logger.warning(f"native hostops build failed: {e}")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.isfile(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.warp_affine_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.warp_affine_batch.restype = None
    lib.hostops_abi_version.restype = ctypes.c_int
    assert lib.hostops_abi_version() == 1
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def warp_affine_batch(
    images: np.ndarray,       # (N, H, W, 3) uint8 RGB
    inv_affines: np.ndarray,  # (N, 2, 3) or (N, 6) crop->raw inverse maps
    jitter: np.ndarray,       # (N, 4) brightness/contrast/saturation/blur
    out_h: int,
    out_w: int,
    n_threads: int = 0,
) -> np.ndarray:
    """-> (N, out_h, out_w, 3) float32 normalized to [-0.5, 0.5]."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native hostops library unavailable")
    images = np.ascontiguousarray(images, np.uint8)
    inv = np.ascontiguousarray(inv_affines, np.float32).reshape(len(images), 6)
    jit = np.ascontiguousarray(jitter, np.float32)
    n, sh, sw, _ = images.shape
    dst = np.empty((n, out_h, out_w, 3), np.float32)
    lib.warp_affine_batch(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, sh, sw,
        inv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        jit.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_h, out_w, n_threads,
    )
    return dst
