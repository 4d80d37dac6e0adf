#!/usr/bin/env python
"""On-chip sweep: sub_k (tiles per grid step) x tile_px for the Pallas
raster. The round-1 audit measured ~12 us of fixed cost per grid step
vs ~2 us of useful chunk work per tile at realistic F~2.5k — if that
holds, amortizing k tiles per step should approach k-fold savings on
the fixed part. mesh_scene is the real-render proxy used for the xbin
decision; rand is the worst case. Tunnel rules per CLAUDE.md.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from probe_xbin import mesh_scene, random_scene, timeit
from artiboost_tpu.ops.rasterizer_pallas import rasterize_batch_pallas


def bench(scene, B, size, configs, cull=False):
    verts, attrs, faces = scene(B, size)
    v0, a0 = jnp.asarray(verts), jnp.asarray(attrs)
    fj = jnp.asarray(faces)
    print(f"--- {scene.__name__} B={B} {size}px F={faces.shape[0]} cull={cull} ---")
    for name, kw in configs:
        fn = jax.jit(lambda v, a, kw=kw: rasterize_batch_pallas(
            v, a, fj, None, size, size, cull_backfaces=cull, **kw))
        dt = timeit(lambda r: (v0 + 0.01 * r, a0), fn)
        print(f"  {name:24s} {dt * 1e3:8.1f} ms  {B / dt:8.1f} renders/s")


if __name__ == "__main__":
    print("devices:", jax.devices())
    cfgs = [
        ("t512 k1 (baseline)", dict(tile_px=512, sub_k=1)),
        ("t512 k2", dict(tile_px=512, sub_k=2)),
        ("t512 k4", dict(tile_px=512, sub_k=4)),
        ("t512 k8", dict(tile_px=512, sub_k=8)),
        ("t256 k4", dict(tile_px=256, sub_k=4)),
        ("t256 k8", dict(tile_px=256, sub_k=8)),
        ("t256 k16", dict(tile_px=256, sub_k=16)),
        ("t1024 k2", dict(tile_px=1024, sub_k=2)),
        ("t1024 k4", dict(tile_px=1024, sub_k=4)),
    ]
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "mesh"):
        bench(mesh_scene, 64, 224, cfgs)
    if which in ("all", "rand"):
        bench(random_scene, 64, 224, cfgs)
