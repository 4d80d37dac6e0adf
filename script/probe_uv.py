#!/usr/bin/env python
"""On-chip A/B: per-pixel UV texturing cost in the real synth pipeline
(VERDICT r2 item 2 'done' gate: texture path < 10% of raster time).

Measures the composed 224^2 B=128 pipeline with (a) Gouraud vertex
colors, (b) nearest-texel UV sampling, (c) bilinear UV sampling — all at
the LOD-256 / tile-512 / sub_k-4 defaults.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from artiboost_tpu.artiboost.loader import ArtiBoostLoader
from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.utils.config import load_config

DISPATCH_FLOOR = 0.028
B = 128


def make_loader(textured: bool, bilinear: bool = False):
    cfg = load_config("config/ho3dv2_clasbased_artiboost.yaml")
    manager_cfg = dict(cfg["MANAGER"])
    manager_cfg["DATA_PRESET"] = cfg.get("DATA_PRESET", {})
    manager_cfg["CONFIG_LEN_TRAIN"] = 256
    manager_cfg["OPG_BATCH_SIZE"] = 256
    rend = dict(manager_cfg.get("RENDERER", {}))
    rend["TEXTURED"] = textured
    rend["BILINEAR"] = bilinear
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
    print("devices:", jax.devices(), flush=True)
    rows = {}
    for name, kw in (("gouraud", dict(textured=False)),
                     ("uv_nearest", dict(textured=True)),
                     ("uv_bilinear", dict(textured=True, bilinear=True))):
        loader = make_loader(**kw)
        t = timed(jax.jit(loader.synth_batch_fn), loader.generated)
        rows[name] = round(t * 1e3, 1)
        print(json.dumps({"mode": name, "synth_ms": rows[name],
                          "img_per_sec": round(B / t, 1)}), flush=True)
    print(json.dumps({
        "uv_nearest_extra_ms": round(rows["uv_nearest"] - rows["gouraud"], 1),
        "uv_bilinear_extra_ms": round(rows["uv_bilinear"] - rows["gouraud"], 1),
    }), flush=True)


if __name__ == "__main__":
    main()
