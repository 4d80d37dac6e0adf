#!/usr/bin/env python
"""On-chip A/B: 1D y-culled rasterizer vs 2D x-binned variants.

Two scenes: the random-triangle worst case (huge faces — binning should
NOT win) and a mesh-like small-face scene (real renders — binning should
win). Tunnel rules: vary inputs per rep, fetch a scalar, subtract the
dispatch floor once per rep (see CLAUDE.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from artiboost_tpu.ops.rasterizer_pallas import rasterize_batch_pallas

DISPATCH_FLOOR = 0.028


def timeit(make_args, fn, reps=8):
    def fetch(out):
        leaf = next(x for x in jax.tree_util.tree_leaves(out)
                    if hasattr(x, "dtype"))
        return float(jnp.ravel(leaf)[0])

    fetch(fn(*make_args(-2)))
    fetch(fn(*make_args(-1)))
    args = [jax.block_until_ready(jax.tree_util.tree_map(jnp.asarray, a))
            for a in (make_args(r) for r in range(reps))]
    t0 = time.time()
    for a in args:
        fetch(fn(*a))
    return max((time.time() - t0) / reps - DISPATCH_FLOOR, 1e-9)


def random_scene(B, size, V=1024, F=2048):
    rng = np.random.RandomState(0)
    verts = rng.rand(B, V, 3).astype(np.float32)
    verts[..., :2] *= size
    verts[..., 2] = verts[..., 2] * 0.5 + 0.3
    attrs = rng.rand(B, V, 3).astype(np.float32)
    faces = rng.randint(0, V, (F, 3)).astype(np.int32)
    return verts, attrs, faces


def mesh_scene(B, size, V=1024, F=2048):
    """Small-face proxy of a real render: verts jittered on a grid
    covering ~70% of the frame, faces connect spatial neighbors."""
    rng = np.random.RandomState(0)
    g = int(np.sqrt(V))
    gy, gx = np.mgrid[0:g, 0:g].astype(np.float32)
    span = 0.7 * size
    base_x = size * 0.15 + gx / g * span
    base_y = size * 0.15 + gy / g * span
    verts = np.zeros((B, g * g, 3), np.float32)
    verts[..., 0] = base_x.ravel()[None] + rng.randn(B, g * g) * (span / g * 0.3)
    verts[..., 1] = base_y.ravel()[None] + rng.randn(B, g * g) * (span / g * 0.3)
    verts[..., 2] = 0.3 + rng.rand(B, g * g) * 0.2
    attrs = rng.rand(B, g * g, 3).astype(np.float32)
    # faces over grid neighbors (two tris per cell), truncated/padded to F
    faces = []
    for r in range(g - 1):
        for c in range(g - 1):
            i = r * g + c
            faces.append([i, i + 1, i + g])
            faces.append([i + 1, i + g + 1, i + g])
    faces = np.asarray(faces[:F], np.int32)
    if len(faces) < F:
        faces = np.concatenate([faces, faces[: F - len(faces)]])
    return verts, attrs, faces


def bench(scene, B, size, configs):
    verts, attrs, faces = scene(B, size)
    v0, a0 = jnp.asarray(verts), jnp.asarray(attrs)
    fj = jnp.asarray(faces)
    print(f"--- {scene.__name__} B={B} {size}px F={faces.shape[0]} ---")
    for name, kw in configs:
        fn = jax.jit(lambda v, a, kw=kw: rasterize_batch_pallas(
            v, a, fj, None, size, size, **kw))
        dt = timeit(lambda r: (v0 + 0.01 * r, a0), fn)
        print(f"  {name:24s} {dt * 1e3:8.1f} ms  {B / dt:8.1f} renders/s")


if __name__ == "__main__":
    print("devices:", jax.devices())
    cfgs224 = [
        ("1d tile=1024 (baseline)", dict(tile_px=1024)),
        ("xbin 112x8", dict(xbin_w=112, tile_rows=8)),
        ("xbin 112x16", dict(xbin_w=112, tile_rows=16)),
        ("xbin 64x8", dict(xbin_w=64, tile_rows=8)),
        ("xbin 64x16", dict(xbin_w=64, tile_rows=16)),
        ("xbin 32x16", dict(xbin_w=32, tile_rows=16)),
        ("xbin 32x32", dict(xbin_w=32, tile_rows=32)),
    ]
    cfgs512 = [
        ("1d tile=512 (baseline)", dict(tile_px=512)),
        ("xbin 128x8", dict(xbin_w=128, tile_rows=8)),
        ("xbin 64x8", dict(xbin_w=64, tile_rows=8)),
        ("xbin 64x16", dict(xbin_w=64, tile_rows=16)),
        ("xbin 32x16", dict(xbin_w=32, tile_rows=16)),
    ]
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "mesh224"):
        bench(mesh_scene, 64, 224, cfgs224)
    if which in ("all", "rand224"):
        bench(random_scene, 64, 224, cfgs224)
    if which in ("all", "mesh512"):
        bench(mesh_scene, 16, 512, cfgs512)
    if which in ("all", "rand512"):
        bench(random_scene, 16, 512, cfgs512)
