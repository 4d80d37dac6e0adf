#!/usr/bin/env python
"""On-chip A/B: quad-subsampled texel gather (tex_subsample) x render LOD
budget on the production synth pipeline (VERDICT r3 item 5).

The texel row-gather costs ~17.8 ms/batch outside the kernel (round 3);
fetching albedo once per s x s pixel quad cuts its HBM traffic s^2 x.
Quality is reported alongside speed: mean/max abs image delta and the
fraction of pixels off by > 2/255 vs the full-rate render of the SAME
scene (same key -> same aug/light/bg draws).

Usage: probe_texsub.py [lod ...]   (default: 256 128)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from artiboost_tpu.artiboost.loader import ArtiBoostLoader
from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.utils.config import load_config
from probe_lod import B, timed

def make_loader(lod_faces: int, tex_subsample: int = 1):
    cfg = load_config("config/ho3dv2_clasbased_artiboost.yaml")
    manager_cfg = dict(cfg["MANAGER"])
    manager_cfg["DATA_PRESET"] = cfg.get("DATA_PRESET", {})
    manager_cfg["CONFIG_LEN_TRAIN"] = 256
    manager_cfg["OPG_BATCH_SIZE"] = 256
    rend = dict(manager_cfg.get("RENDERER", {}))
    rend["LOD_FACES"] = lod_faces
    rend["TEX_SUBSAMPLE"] = tex_subsample
    manager_cfg["RENDERER"] = rend
    loader = ArtiBoostLoader(real_dataset=None, cfg=manager_cfg,
                             batch_size=B, seed=0)
    loader.prepare()
    return loader


def image_of(loader, gen):
    out = jax.jit(loader.synth_batch_fn)(
        jax.random.PRNGKey(5), gen, jnp.arange(B, dtype=jnp.int32))
    return np.asarray(out[Queries.IMAGE])


def main():
    print("devices:", jax.devices(), flush=True)
    lods = [int(a) for a in sys.argv[1:]] or [256, 128]
    gen = None
    ref_imgs = {}
    for lod in lods:
        for s in (1, 2):
            loader = make_loader(lod, s)
            if gen is None:
                gen = loader.generated
            t = timed(jax.jit(loader.synth_batch_fn), gen)
            row = {"lod": lod, "tex_subsample": s,
                   "synth_ms": round(t * 1e3, 1),
                   "img_per_sec": round(B / t, 1)}
            img = image_of(loader, gen)
            if s == 1:
                ref_imgs[lod] = img
            else:
                d = np.abs(img - ref_imgs[lod])
                row.update({
                    "mean_abs_delta": round(float(d.mean()), 5),
                    "max_abs_delta": round(float(d.max()), 3),
                    "pix_gt_2_255": round(float((d.max(-1) > 2 / 255).mean()), 4),
                })
            print(json.dumps(row), flush=True)
    # cross-LOD quality: lod-128 full-rate image vs lod-256 full-rate
    if len(lods) > 1 and all(l in ref_imgs for l in lods[:2]):
        d = np.abs(ref_imgs[lods[0]] - ref_imgs[lods[1]])
        print(json.dumps({"cross_lod": lods[:2],
                          "mean_abs_delta": round(float(d.mean()), 5),
                          "pix_gt_2_255": round(float((d.max(-1) > 2 / 255).mean()), 4)}),
              flush=True)


if __name__ == "__main__":
    main()
