"""Host-side image augmentation primitives (parity:
``anakin/utils/img_augment.py`` — PIL color jitter / affine warp ops).

These are the single-sample numpy/cv2 fallbacks; the batched production
path is the multithreaded C++ implementation in ``native/hostops.cpp``
(same semantics, verified against each other in tests/test_native.py),
and the on-device synthetic pipeline applies the equivalent jitters in
``artiboost_tpu/artiboost/renderer.py``.
"""
from __future__ import annotations

import cv2
import numpy as np


def gaussian_blur(img: np.ndarray, sigma: float, ksize: int = 5) -> np.ndarray:
    """img float (H, W, 3) in [0, 1]; no-op for tiny sigma."""
    if sigma <= 0.1:
        return img
    return cv2.GaussianBlur(img, (ksize, ksize), float(sigma))


def color_jitter(img: np.ndarray, brightness: float, contrast: float,
                 saturation: float) -> np.ndarray:
    """Multiplicative brightness, mean-anchored contrast, gray-anchored
    saturation (the reference's PIL enhancer semantics), clipped to [0, 1]."""
    img = img * brightness
    mean = img.mean()
    img = (img - mean) * contrast + mean
    gray = img.mean(-1, keepdims=True)
    img = (img - gray) * saturation + gray
    return np.clip(img, 0.0, 1.0)


def warp_crop(img: np.ndarray, affine_transf: np.ndarray,
              out_size: tuple) -> np.ndarray:
    """Bilinear affine crop to ``out_size`` (W, H)."""
    return cv2.warpAffine(img, affine_transf[:2], (out_size[0], out_size[1]),
                          flags=cv2.INTER_LINEAR)


def augment_sample(img_u8: np.ndarray, affine_transf: np.ndarray,
                   jitter: np.ndarray, out_size: tuple,
                   aug: bool = True) -> np.ndarray:
    """uint8 (H, W, 3) -> augmented, cropped, mean-.5-normalized float32.

    ``jitter`` = [brightness, contrast, saturation, blur_sigma] as drawn by
    ``HODataset._make_geom`` (hodata.py:434-447 parity).
    """
    img = img_u8.astype(np.float32) / 255.0
    if aug:
        img = gaussian_blur(img, float(jitter[3]))
        img = color_jitter(img, float(jitter[0]), float(jitter[1]),
                           float(jitter[2]))
    img = warp_crop(img, affine_transf, out_size)
    return (img - 0.5).astype(np.float32)
