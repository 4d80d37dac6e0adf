#!/usr/bin/env python
"""Standing ON-CHIP kernel parity gate (VERDICT r4 item 3).

The test suite runs the Pallas rasterizer in interpret mode on CPU
(``ops/rasterizer_pallas.py`` sets interpret= on the cpu backend), so a
Mosaic-compilation bug is invisible to it. This gate re-runs the golden
XLA-vs-Pallas comparisons ON THE REAL CHIP: Gouraud, uv_mode, out_ct
on/off, sub_k in {1, 8}, the binned path, and the full production
LOD+UV synth pipeline (out_ct layout A/B, bit-exact).

Run standalone:
    PYTHONPATH=/root/repo:/root/.axon_site python script/chip_parity.py
or from bench.py via ``run_all()`` (a parity line rides every BENCH).
"""
from __future__ import annotations

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from artiboost_tpu.ops.rasterizer import rasterize_batch
from artiboost_tpu.ops.rasterizer_pallas import rasterize_batch_pallas

H = W = 64


def _scene(seed=0, B=2, V=80, F=160, z0=0.3):
    rng = np.random.RandomState(seed)
    verts = np.zeros((B, V, 3), np.float32)
    verts[..., 0] = rng.rand(B, V) * W
    verts[..., 1] = rng.rand(B, V) * H
    verts[..., 2] = z0 + rng.rand(B, V)
    attrs = rng.rand(B, V, 3).astype(np.float32)
    faces = rng.randint(0, V, (F, 3)).astype(np.int32)
    return jnp.asarray(verts), jnp.asarray(attrs), jnp.asarray(faces), rng


def _fetch(*arrays):
    return [np.asarray(a) for a in arrays]  # forces the lazy tunnel


def check_gouraud_vs_xla():
    verts, attrs, faces, _ = _scene()
    a_ref, d_ref = _fetch(*rasterize_batch(verts, attrs, faces, None, H, W,
                                           face_chunk=32, row_chunk=8))
    a, d = _fetch(*rasterize_batch_pallas(verts, attrs, faces, None, H, W,
                                          tile_px=512, sub_k=8))
    okd = np.isclose(d, d_ref, atol=1e-3).mean()
    oka = np.all(np.isclose(a, a_ref, atol=1e-2), axis=-1).mean()
    assert okd > 0.995 and oka > 0.995, (okd, oka)
    return f"gouraud_xla d={okd:.4f} a={oka:.4f}"


def check_out_ct_layouts():
    verts, attrs, faces, _ = _scene(seed=1)
    msgs = []
    for sub_k in (1, 8):
        a_ref, d_ref = _fetch(*rasterize_batch_pallas(
            verts, attrs, faces, None, H, W, tile_px=512, sub_k=sub_k,
            out_ct=False))
        a, d = _fetch(*rasterize_batch_pallas(
            verts, attrs, faces, None, H, W, tile_px=512, sub_k=sub_k,
            out_ct=True))
        assert np.array_equal(d, d_ref) and np.array_equal(a, a_ref), sub_k
        msgs.append(f"out_ct[sub_k={sub_k}] bitexact")
    return ", ".join(msgs)


def check_uv_mode():
    verts, _, faces, rng = _scene(seed=2)
    B, V = verts.shape[:2]
    uv = rng.rand(B, V, 2).astype(np.float32)
    s = (rng.rand(B, V) * 3.5).astype(np.float32)
    attrs = jnp.asarray(np.concatenate(
        [uv, s[..., None], np.full((B, V, 1), 5.0, np.float32)], -1))
    a_ref, d_ref = _fetch(*rasterize_batch(verts, attrs, faces, None, H, W,
                                           face_chunk=32, row_chunk=8))
    # out_ct on/off parity in uv_mode, and interpolation vs XLA
    ref5 = _fetch(*rasterize_batch_pallas(verts, attrs, faces, None, H, W,
                                          tile_px=512, sub_k=8, uv_mode=True,
                                          out_ct=False))
    out5 = _fetch(*rasterize_batch_pallas(verts, attrs, faces, None, H, W,
                                          tile_px=512, sub_k=8, uv_mode=True,
                                          out_ct=True))
    for o, r in zip(out5, ref5):
        assert np.array_equal(o, r), "uv out_ct layout mismatch"
    quv, shade, page, _win, d = out5
    okd = np.isclose(d, d_ref, atol=1e-3)
    u = np.floor(quv / 4096.0) / 4095.0
    v = (quv % 4096.0) / 4095.0
    oku = (np.abs(u - a_ref[..., 0]) < 3e-3)[okd].mean()
    okv = (np.abs(v - a_ref[..., 1]) < 3e-3)[okd].mean()
    oks = (np.abs(shade - a_ref[..., 2]) < 2e-2)[okd].mean()
    assert okd.mean() > 0.995 and min(oku, okv, oks) > 0.995, \
        (okd.mean(), oku, okv, oks)
    hit = d > 0
    assert (page[hit] == 5).all(), "uv page channel corrupt"
    return f"uv_mode d={okd.mean():.4f} u={oku:.4f} v={okv:.4f} s={oks:.4f}"


def check_binned():
    verts, attrs, faces, _ = _scene(seed=3)
    a_ref, d_ref = _fetch(*rasterize_batch_pallas(verts, attrs, faces, None,
                                                  H, W, tile_px=512))
    a, d = _fetch(*rasterize_batch_pallas(verts, attrs, faces, None, H, W,
                                          xbin_w=32, tile_rows=8))
    assert np.allclose(d, d_ref, atol=1e-6) and np.allclose(a, a_ref, atol=1e-6)
    return "binned==1d"


def check_production_lod_uv(B=8):
    """The full production synth pipeline (LOD + per-pixel UV + out_ct) on
    the chip: out_ct True vs False images must be bit-identical (same
    kernel math, different output DMA layout), and non-degenerate."""
    from artiboost_tpu.artiboost import renderer as renderer_mod
    from artiboost_tpu.artiboost.loader import ArtiBoostLoader
    from artiboost_tpu.datasets.hoquery import Queries
    from artiboost_tpu.utils.config import load_config

    orig = renderer_mod.rasterize_batch_pallas
    imgs = []
    for out_ct in (True, False):
        renderer_mod.rasterize_batch_pallas = partial(orig, out_ct=out_ct)
        try:
            cfg = load_config("config/ho3dv2_clasbased_artiboost.yaml")
            manager_cfg = dict(cfg["MANAGER"])
            manager_cfg["DATA_PRESET"] = cfg.get("DATA_PRESET", {})
            manager_cfg["CONFIG_LEN_TRAIN"] = 16
            manager_cfg["OPG_BATCH_SIZE"] = 16
            loader = ArtiBoostLoader(real_dataset=None, cfg=manager_cfg,
                                     batch_size=B, seed=3)
            loader.prepare()
            out = jax.jit(loader.synth_batch_fn)(
                jax.random.PRNGKey(11), loader.generated,
                jnp.arange(B, dtype=jnp.int32))
            imgs.append(np.asarray(out[Queries.IMAGE]))
        finally:
            renderer_mod.rasterize_batch_pallas = orig
    assert np.array_equal(imgs[0], imgs[1]), "production out_ct mismatch"
    nz = float(np.mean(imgs[0] != -0.5))
    assert nz > 0.5, f"production render degenerate ({nz:.1%} non-bg)"
    return f"production_lod_uv bitexact ({nz:.1%} non-bg px)"


def run_all(production: bool = True) -> str:
    checks = [check_gouraud_vs_xla, check_out_ct_layouts, check_uv_mode,
              check_binned]
    if production:
        checks.append(check_production_lod_uv)
    msgs = []
    for fn in checks:
        msgs.append(fn())
    return "; ".join(msgs)


def main():
    import time

    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    summary = run_all()
    print(f"CHIP PARITY OK ({time.time() - t0:.1f}s): {summary}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
