#!/usr/bin/env python
"""On-chip A/B: backface culling in the real composed synth pipeline.

Culling marks back-facing faces invalid in ``build_screen_faces``; the
y-sort then sinks them past the live chunk ranges, so whole 128-face
chunks drop out of the kernel loop. The synthetic hand stand-in and the
(fixed) synthetic object library are consistently outward-wound, so the
z-buffer already hides almost everything culling removes — the image
delta reported here bounds the divergence (pyrender, the reference
renderer, culls backfaces by default).

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


def make_loader(cull: bool):
    cfg = load_config("config/ho3dv2_clasbased_artiboost.yaml")
    manager_cfg = dict(cfg["MANAGER"])
    manager_cfg["DATA_PRESET"] = cfg.get("DATA_PRESET", {})
    manager_cfg["CONFIG_LEN_TRAIN"] = 256
    manager_cfg["OPG_BATCH_SIZE"] = 256
    rend = dict(manager_cfg.get("RENDERER", {}))
    rend["CULL_BACKFACES"] = cull
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
        float(jnp.ravel(a)[0])  # force resident
    t0 = time.time()
    for a in argsets:
        out = fn(key, gen, a)
        float(jnp.ravel(out[Queries.IMAGE])[0])
    return (time.time() - t0) / reps - DISPATCH_FLOOR


def main():
    print("devices:", jax.devices())
    la = make_loader(False)
    lb = make_loader(True)
    # pose generation is render-independent: same seed -> same triplets
    assert np.allclose(np.asarray(la.generated.obj_pose),
                       np.asarray(lb.generated.obj_pose))

    fa = jax.jit(la.synth_batch_fn)
    fb = jax.jit(lb.synth_batch_fn)

    # ---- correctness: same key/gen/idx, compare images ----
    key = jax.random.PRNGKey(7)
    idx = jnp.arange(B, dtype=jnp.int32)
    ia = np.asarray(fa(key, la.generated, idx)[Queries.IMAGE])
    ib = np.asarray(fb(key, lb.generated, idx)[Queries.IMAGE])
    diff = np.abs(ia - ib)
    frac = float((diff.max(-1) > 1.5 / 255.0).mean())
    print(json.dumps({
        "pixel_frac_differing": round(frac, 5),
        "max_abs_diff": round(float(diff.max()), 4),
        "mean_abs_diff": round(float(diff.mean()), 6),
    }))

    # ---- perf ----
    ta = timed(fa, la.generated)
    tb = timed(fb, lb.generated)
    print(json.dumps({
        "synth_ms_nocull": round(ta * 1e3, 1),
        "synth_ms_cull": round(tb * 1e3, 1),
        "img_per_sec_nocull": round(B / ta, 1),
        "img_per_sec_cull": round(B / tb, 1),
        "speedup": round(ta / tb, 3),
    }))


if __name__ == "__main__":
    main()
