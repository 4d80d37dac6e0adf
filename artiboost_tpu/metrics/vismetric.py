"""First-batch visualization metric (parity:
``anakin/metrics/vismetric.py:70-137``): draws predicted vs GT skeleton
and corner-cube overlays on a grid of de-normalized images, for the
recorder/TensorBoard. Host-side PIL drawing, eval only.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
from PIL import Image, ImageDraw

from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.metrics.metric import Metric
from artiboost_tpu.utils.misc import CONST
from artiboost_tpu.utils.registry import METRIC

_FINGER_COLORS = ["#ff0000", "#00ff00", "#0000ff", "#ffff00", "#ff00ff"]


def _draw_skeleton(draw: ImageDraw.ImageDraw, kps: np.ndarray, offset, scale=1.0):
    parents = CONST.JOINTS_IDX_PARENTS
    for i in range(1, 21):
        p = parents[i]
        color = _FINGER_COLORS[(i - 1) // 4]
        draw.line(
            [
                (offset[0] + kps[p, 0] * scale, offset[1] + kps[p, 1] * scale),
                (offset[0] + kps[i, 0] * scale, offset[1] + kps[i, 1] * scale),
            ],
            fill=color, width=1,
        )


def _draw_corners(draw: ImageDraw.ImageDraw, corners: np.ndarray, offset,
                  color="#00ffff", link_order=None):
    if link_order is not None:
        # CORNER_LINK_ORDER: a polyline through the corner ids (datasets whose
        # canonical corner order differs from the default cube wiring)
        pairs = list(zip(link_order[:-1], link_order[1:]))
    else:
        pairs = CONST.CORNERCUBE_IDX_ORDER
    for a, b in pairs:
        draw.line(
            [
                (offset[0] + corners[a, 0], offset[1] + corners[a, 1]),
                (offset[0] + corners[b, 0], offset[1] + corners[b, 1]),
            ],
            fill=color, width=1,
        )


class VisMetric(Metric):
    """Base marker class (evaluator skips these in scalar dumps)."""

    def __init__(self, **cfg):
        super().__init__()
        self.images: Optional[Image.Image] = None


@METRIC.register_module
class Vis2DMetric(VisMetric):
    def __init__(self, **cfg) -> None:
        super().__init__(**cfg)
        self.ncol = cfg.get("NCOL", 4)
        self.nrow = cfg.get("NROW", 4)
        self.mean = cfg.get("MEAN", 0.5)
        self.std = cfg.get("STD", 1.0)
        self.corner_link_order = cfg.get("CORNER_LINK_ORDER")
        self.reset()

    def reset(self):
        self.images = None
        self.count = 0

    def feed(self, preds: Dict, targs: Dict, **kwargs):
        if self.images is not None:  # only first batch per epoch
            return
        image = np.asarray(targs[Queries.IMAGE])  # (B, H, W, 3) normalized
        n = min(self.ncol * self.nrow, image.shape[0])
        H, W = image.shape[1], image.shape[2]
        intr = np.asarray(targs[Queries.CAM_INTR])
        joints_2d_uvd = preds.get("2d_uvd")
        grid = Image.new("RGB", (self.ncol * W, self.nrow * H))
        for i in range(n):
            img = ((image[i] * self.std + self.mean) * 255.0).clip(0, 255).astype(np.uint8)
            tile = Image.fromarray(img)
            draw = ImageDraw.Draw(tile)
            if joints_2d_uvd is not None:
                kps = np.asarray(joints_2d_uvd)[i, :21, :2] * [W, H]
                _draw_skeleton(draw, kps, (0, 0))
            if "corners_3d_abs" in preds:
                c_abs = np.asarray(preds["corners_3d_abs"])[i]
                hom = intr[i] @ c_abs.T
                c2d = (hom[:2] / np.maximum(hom[2:], 1e-8)).T
                _draw_corners(draw, c2d, (0, 0), link_order=self.corner_link_order)
            grid.paste(tile, ((i % self.ncol) * W, (i // self.ncol) * H))
        self.images = grid
        self.count += n

    def get_measures(self, **kwargs) -> Dict:
        return {}

    def __str__(self):
        return "vis2d"


@METRIC.register_module
class VisHand2DMetric(Vis2DMetric):
    """Hand-only overlay variant (parity: ``anakin/metrics/vismetric.py:360``
    — used by hand-only models with no corner predictions)."""

    def __init__(self, **cfg):
        super().__init__(**cfg)
        self.corner_link_order = None

    def feed(self, preds, targs, **kwargs):
        preds = {k: v for k, v in preds.items() if k != "corners_3d_abs"}
        super().feed(preds, targs, **kwargs)
