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
    "render_scene": R.render_scene,
    "decode": PG.decode_final_hand,
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
    R.render_scene = ORIG["render_scene"]
    PG.decode_final_hand = ORIG["decode"]
    # synth_batch imported the names at module load — repoint those too
    SB._gaussian_blur = R._gaussian_blur
    SB._color_jitter = R._color_jitter
    SB.rotate_hand_global = PG.rotate_hand_global
    SB.render_scene = R.render_scene
    SB.decode_final_hand = PG.decode_final_hand


def ablate(name):
    restore()
    if name == "no_bg":
        orig_rs = R.render_scene

        def rs_nobg(verts, colors, faces, face_valid, intr, backgrounds,
                    key, height, width, **kw):
            import numpy as _np
            one_bg = backgrounds[:1, :height, :width]
            return orig_rs(verts, colors, faces, face_valid, intr,
                           jnp.broadcast_to(one_bg, (1,) + one_bg.shape[1:]),
                           key, height, width, **kw)

        SB.render_scene = rs_nobg
    elif name == "no_decode":
        orig_dec = PG.decode_final_hand
        cache = {}

        def dec_cached(model, gen, idx):
            k = id(gen)
            if k not in cache:
                cache[k] = orig_dec(model, gen, jnp.arange(idx.shape[0]))
            out = cache[k]
            # keep a data dependency on idx so the dataflow stays intact
            return {kk: vv + 0.0 * idx[0] if vv.dtype.kind == "f" else vv
                    for kk, vv in out.items()}

        PG.decode_final_hand = dec_cached
        SB.decode_final_hand = dec_cached
    elif name == "no_blur_jitter":
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
    names = (sys.argv[1:] if sys.argv[1:] else
             ["full", "no_blur_jitter", "no_hand_annot", "flat_albedo"])
    for name in names:
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

    if sys.argv[1:]:
        return  # explicit ablation list: skip the tile sweep
    for tile_px, sub_k in ((512, 8), (1024, 4), (1024, 8), (2048, 2), (2048, 4)):
        loader = make_loader(tile_px, sub_k)
        t = timed(jax.jit(loader.synth_batch_fn), gen)
        print(json.dumps({"tile_px": tile_px, "sub_k": sub_k,
                          "synth_ms": round(t * 1e3, 1),
                          "img_per_sec": round(B / t, 1)}), flush=True)


if __name__ == "__main__":
    main()
