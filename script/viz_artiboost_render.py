#!/usr/bin/env python
"""Standalone ArtiBoost synthesis visualizer.

Parity: ``script/viz_artiboost_render.py`` in the reference — run the
ArtiBoost engine end-to-end (triplet sampling -> pose generation -> on-device
rasterization) without any real dataset, and save rendered synth samples
with GT skeleton / corner-cube overlays for visual inspection.

Usage:
    python script/viz_artiboost_render.py --cfg config/ho3dv2_clasbased_artiboost.yaml \
        --n_samples 16 --out exp/viz_synth
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from artiboost_tpu.artiboost.loader import ArtiBoostLoader  # noqa: E402
from artiboost_tpu.datasets.hoquery import Queries  # noqa: E402
from artiboost_tpu.utils.config import load_config  # noqa: E402
from artiboost_tpu.utils.logger import logger  # noqa: E402
from artiboost_tpu.viztools import (  # noqa: E402
    draw_corners_2d,
    draw_skeleton_2d,
    image_grid,
)
from PIL import Image  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", type=str,
                        default="config/ho3dv2_clasbased_artiboost.yaml")
    parser.add_argument("--n_samples", type=int, default=16)
    parser.add_argument("--out", type=str, default="exp/viz_synth")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--flat", action="store_true",
                        help="Gouraud vertex colors instead of the default "
                             "per-pixel texture sampling (HTML-hand / YCB "
                             "textures when on disk, procedural stand-ins "
                             "otherwise)")
    args = parser.parse_args()

    cfg = load_config(args.cfg)
    manager_cfg = dict(cfg["MANAGER"])
    manager_cfg["DATA_PRESET"] = cfg.get("DATA_PRESET", {})
    manager_cfg["CONFIG_LEN_TRAIN"] = max(args.n_samples, 8)
    if args.flat:
        manager_cfg.setdefault("RENDERER", {})
        manager_cfg["RENDERER"] = dict(manager_cfg["RENDERER"], TEXTURED=False)

    loader = ArtiBoostLoader(
        real_dataset=None, cfg=manager_cfg,
        batch_size=args.n_samples, seed=args.seed,
    )
    logger.info("generating synth poses ...")
    loader.prepare()

    batch = next(iter(loader))
    os.makedirs(args.out, exist_ok=True)

    imgs = np.asarray(batch[Queries.IMAGE]) + 0.5  # de-normalize
    joints_2d = np.asarray(batch[Queries.JOINTS_2D])
    corners_2d = np.asarray(batch[Queries.CORNERS_2D])
    tiles = []
    for i in range(imgs.shape[0]):
        tile = Image.fromarray((imgs[i] * 255).clip(0, 255).astype(np.uint8))
        draw_skeleton_2d(tile, joints_2d[i])
        draw_corners_2d(tile, corners_2d[i])
        tiles.append(np.asarray(tile))
        Image.fromarray(tiles[-1]).save(os.path.join(args.out, f"synth_{i:03d}.png"))
    grid = image_grid(tiles, ncol=int(np.ceil(np.sqrt(len(tiles)))))
    grid_path = os.path.join(args.out, "synth_grid.png")
    grid.save(grid_path)
    logger.info(f"saved {len(tiles)} overlaid synth samples -> {grid_path}")


if __name__ == "__main__":
    main()
