#!/usr/bin/env python
"""On-chip sweep: render LOD budget x kernel tile shape for the real
composed synth pipeline at 224^2, B=128.

Why a joint sweep: face reduction alone hits the kernel's ~1-chunk-per-
tile floor (the cull A/B measured only +7.7% for a 2x face cut) — but a
small face count makes LARGER tiles affordable (fewer grid steps, each
still y-culled), so the two knobs must be tuned together.

Tunnel rules: vary inputs per rep, fetch a scalar per rep, subtract the
28 ms dispatch floor once per rep (see CLAUDE.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from artiboost_tpu.artiboost.loader import ArtiBoostLoader
from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.utils.config import load_config

DISPATCH_FLOOR = 0.028
B = 128


def make_loader(lod_faces: int, tile_px=None, sub_k=None):
    cfg = load_config("config/ho3dv2_clasbased_artiboost.yaml")
    manager_cfg = dict(cfg["MANAGER"])
    manager_cfg["DATA_PRESET"] = cfg.get("DATA_PRESET", {})
    manager_cfg["CONFIG_LEN_TRAIN"] = 256
    manager_cfg["OPG_BATCH_SIZE"] = 256
    rend = dict(manager_cfg.get("RENDERER", {}))
    rend["LOD_FACES"] = lod_faces
    if tile_px is not None:
        rend["TILE_PX"] = tile_px
    if sub_k is not None:
        rend["SUB_K"] = sub_k
    manager_cfg["RENDERER"] = rend
    loader = ArtiBoostLoader(real_dataset=None, cfg=manager_cfg,
                             batch_size=B, seed=0)
    loader.prepare()
    return loader


def timed(fn, gen, reps=6):
    key = jax.random.PRNGKey(1)
    idx0 = jnp.arange(B, dtype=jnp.int32)
    out = fn(key, gen, idx0)
    float(jnp.ravel(out[Queries.IMAGE])[0])
    argsets = [(idx0 + 3 * r) % 256 for r in range(reps)]
    for a in argsets:
        float(jnp.ravel(a)[0])
    t0 = time.time()
    for a in argsets:
        out = fn(key, gen, a)
        float(jnp.ravel(out[Queries.IMAGE])[0])
    return (time.time() - t0) / reps - DISPATCH_FLOOR


def main():
    print("devices:", jax.devices())
    base = make_loader(0)  # LOD off
    gen = base.generated
    t0 = timed(jax.jit(base.synth_batch_fn), gen)
    print(json.dumps({"lod": 0, "tile": "auto", "synth_ms": round(t0 * 1e3, 1),
                      "img_per_sec": round(B / t0, 1)}))

    results = []
    for lod in (512, 256):
        for tile_px, sub_k in ((None, None), (1024, None), (2048, None),
                               (512, 4), (1024, 2)):
            loader = make_loader(lod, tile_px, sub_k)
            t = timed(jax.jit(loader.synth_batch_fn), gen)
            row = {"lod": lod, "tile_px": tile_px or "auto", "sub_k": sub_k or 1,
                   "synth_ms": round(t * 1e3, 1), "img_per_sec": round(B / t, 1),
                   "speedup_vs_nolod": round(t0 / t, 2)}
            results.append(row)
            print(json.dumps(row), flush=True)

    best = min(results, key=lambda r: r["synth_ms"])
    print("BEST:", json.dumps(best))


if __name__ == "__main__":
    main()
