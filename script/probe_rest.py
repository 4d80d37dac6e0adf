#!/usr/bin/env python
"""On-chip ablation breakdown of the synth pipeline's NON-raster cost
(round 4): with raster at ~39 ms and the texel gather quad-subsampled,
~25 ms/batch remains unattributed. Each ablation patches one stage to a
passthrough and re-times the full pipeline (same scene, same loader).

Also re-sweeps kernel tile shape at the new balance (lod 256, sub2).
Run from the repo root.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from artiboost_tpu.artiboost import renderer as R
from artiboost_tpu.artiboost import synth_batch as SB
from artiboost_tpu.artiboost import pose_generator as PG
from artiboost_tpu.artiboost.loader import ArtiBoostLoader
from artiboost_tpu.utils.config import load_config
from probe_lod import B, timed

ORIG = {
    "blur": R._gaussian_blur,
    "jitter": R._color_jitter,
    "rotate": PG.rotate_hand_global,
    "sample": R.sample_textures,
}


def make_loader(tile_px=None, sub_k=None):
    cfg = load_config("config/ho3dv2_clasbased_artiboost.yaml")
    manager_cfg = dict(cfg["MANAGER"])
    manager_cfg["DATA_PRESET"] = cfg.get("DATA_PRESET", {})
    manager_cfg["CONFIG_LEN_TRAIN"] = 256
    manager_cfg["OPG_BATCH_SIZE"] = 256
    rend = dict(manager_cfg.get("RENDERER", {}))
    if tile_px is not None:
        rend["TILE_PX"] = tile_px
    if sub_k is not None:
        rend["SUB_K"] = sub_k
    manager_cfg["RENDERER"] = rend
    loader = ArtiBoostLoader(real_dataset=None, cfg=manager_cfg,
                             batch_size=B, seed=0)
    loader.prepare()
    return loader


def restore():
    R._gaussian_blur = ORIG["blur"]
    R._color_jitter = ORIG["jitter"]
    PG.rotate_hand_global = ORIG["rotate"]
    R.sample_textures = ORIG["sample"]
    # synth_batch imported the names at module load — repoint those too
    SB._gaussian_blur = R._gaussian_blur
    SB._color_jitter = R._color_jitter
    SB.rotate_hand_global = PG.rotate_hand_global


def ablate(name):
    restore()
    if name == "no_blur_jitter":
        SB._gaussian_blur = lambda img, sigma, radius=3: img
        SB._color_jitter = lambda img, key, **kw: img
    elif name == "no_hand_annot":
        SB.rotate_hand_global = lambda m, r, p, s, t: (p, None)
    elif name == "flat_albedo":
        def flat(quv, shade, page, tex, bilinear=False, subsample=1):
            return jnp.clip(0.5 * shade[..., None]
                            + 0.0 * quv[..., None], 0.0, 1.0)
        R.sample_textures = flat


def main():
    print("devices:", jax.devices(), flush=True)
    gen = None
    for name in ("full", "no_blur_jitter", "no_hand_annot", "flat_albedo"):
        ablate(name)
        try:
            loader = make_loader()
            if gen is None:
                gen = loader.generated
            t = timed(jax.jit(loader.synth_batch_fn), gen)
            print(json.dumps({"ablate": name, "synth_ms": round(t * 1e3, 1),
                              "img_per_sec": round(B / t, 1)}), flush=True)
        finally:
            restore()

    for tile_px, sub_k in ((512, 8), (1024, 4), (1024, 8), (2048, 2), (2048, 4)):
        loader = make_loader(tile_px, sub_k)
        t = timed(jax.jit(loader.synth_batch_fn), gen)
        print(json.dumps({"tile_px": tile_px, "sub_k": sub_k,
                          "synth_ms": round(t * 1e3, 1),
                          "img_per_sec": round(B / t, 1)}), flush=True)


if __name__ == "__main__":
    main()
