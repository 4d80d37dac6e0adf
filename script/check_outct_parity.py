#!/usr/bin/env python
"""On-chip bit-parity check: channel-transposed raster output block
(out_ct=True) vs the (TP, 4) layout (out_ct=False) through the FULL
production synth pipeline (ADVICE r3: interpret-mode tests can't see a
Mosaic relayout bug on the real chip).

Renders the same batch with both layouts and asserts the images are
bit-identical. Exits nonzero on mismatch.
"""
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from artiboost_tpu.artiboost import renderer as renderer_mod
from artiboost_tpu.artiboost.loader import ArtiBoostLoader
from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.utils.config import load_config

ORIG = renderer_mod.rasterize_batch_pallas
B = 16


def render_with(out_ct: bool):
    renderer_mod.rasterize_batch_pallas = partial(ORIG, out_ct=out_ct)
    try:
        cfg = load_config("config/ho3dv2_clasbased_artiboost.yaml")
        manager_cfg = dict(cfg["MANAGER"])
        manager_cfg["DATA_PRESET"] = cfg.get("DATA_PRESET", {})
        manager_cfg["CONFIG_LEN_TRAIN"] = 64
        manager_cfg["OPG_BATCH_SIZE"] = 64
        loader = ArtiBoostLoader(real_dataset=None, cfg=manager_cfg,
                                 batch_size=B, seed=3)
        loader.prepare()
        out = jax.jit(loader.synth_batch_fn)(
            jax.random.PRNGKey(11), loader.generated,
            jnp.arange(B, dtype=jnp.int32))
        return np.asarray(out[Queries.IMAGE])
    finally:
        renderer_mod.rasterize_batch_pallas = ORIG


def main():
    print("devices:", jax.devices(), flush=True)
    img_ct = render_with(True)
    img_plain = render_with(False)
    if np.array_equal(img_ct, img_plain):
        nz = float(np.mean(img_ct != -0.5))  # sanity: scene actually rendered
        print(f"OUT_CT PARITY OK: {img_ct.shape} bit-identical "
              f"({nz:.1%} non-background pixels)")
        return 0
    bad = np.abs(img_ct - img_plain)
    print(f"OUT_CT PARITY FAIL: max |delta|={bad.max()}, "
          f"{np.mean(bad > 0):.2%} pixels differ")
    return 1


if __name__ == "__main__":
    sys.exit(main())
