#!/usr/bin/env python
"""Tile/sub_k retune at the quad-rate (RENDER_SCALE 2) regime.

Round-4 tuned tile 512 / sub_k 8 at the 224² render; round 5 renders
the foreground at 112² (H/2 x W/2), where tiles/frame drop 4x and the
per-grid-step fixed cost vs chunk work balance shifts. Sweep the synth
pipeline end-to-end (the only honest objective — kernel-only timings
mislead via layout effects) over (TILE_PX, SUB_K) and the LOD budget.

    PYTHONPATH=/root/repo:/root/.axon_site python script/probe_rs2_tiles.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from artiboost_tpu.artiboost.loader import ArtiBoostLoader
from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.utils.config import load_config

B = 128
K = 6


def timed_synth(cfg, tile_px=None, sub_k=None, lod=None):
    manager_cfg = dict(cfg["MANAGER"])
    manager_cfg["DATA_PRESET"] = cfg.get("DATA_PRESET", {})
    manager_cfg["CONFIG_LEN_TRAIN"] = 256
    manager_cfg["OPG_BATCH_SIZE"] = 256
    rend = dict(manager_cfg.get("RENDERER", {}))
    if tile_px is not None:
        rend["TILE_PX"] = tile_px
    if sub_k is not None:
        rend["SUB_K"] = sub_k
    if lod is not None:
        rend["LOD"] = lod
    manager_cfg["RENDERER"] = rend
    loader = ArtiBoostLoader(real_dataset=None, cfg=manager_cfg, batch_size=B)
    loader.prepare()
    fn = loader._synth_batch_jit
    gen = loader.generated
    key = jax.random.PRNGKey(1)
    idx0 = jnp.arange(B, dtype=jnp.int32)
    out = fn(key, gen, idx0)
    float(jnp.ravel(out[Queries.IMAGE])[0])  # compile + force
    dts = []
    for loop in range(2):
        t0 = time.time()
        for r in range(K):
            out = fn(key, gen, (idx0 + 3 * (loop * K + r + 1)) % 256)
        float(jnp.ravel(out[Queries.IMAGE])[0])  # one forcing fetch
        dts.append((time.time() - t0 - 0.028) / K)
    return min(dts) * 1e3


def main():
    cfg = load_config("config/ho3dv2_clasbased_artiboost.yaml")
    print(f"devices: {jax.devices()}", flush=True)
    base = timed_synth(cfg)  # production defaults (tile 512 sub_k 8 on LOD)
    print(f"default (512/8, LOD 128): {base:7.1f} ms/batch", flush=True)
    for tile, sub in [(256, 16), (256, 8), (512, 4), (512, 16), (1024, 4),
                      (2048, 2), (1024, 8)]:
        ms = timed_synth(cfg, tile_px=tile, sub_k=sub)
        print(f"tile {tile:4d} sub_k {sub:2d}:     {ms:7.1f} ms/batch "
              f"({(base / ms - 1) * 100:+.1f}%)", flush=True)
    for lod in (96, 192):
        ms = timed_synth(cfg, lod=lod)
        print(f"LOD {lod:3d} (512/8):      {ms:7.1f} ms/batch "
              f"({(base / ms - 1) * 100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
