#!/usr/bin/env python
"""In-process A/B of two raster micro-changes on the FULL production
synth pipeline (LOD-128, uv_mode, tile 512 / sub_k 8 / out_ct):

  planar - uv channel planes sliced from the (4*sub_k, tile_px) blocks
           instead of the NHWC un-interleave transpose (_PLANAR_UV)
  nowpos - pass-1 hit test without the (wbits > 0) term (_SKIP_WPOS;
           subsumed by lmin >= eps because every inv_z is positive)

CRITICAL harness detail: rasterize_batch_pallas is itself module-jitted,
so flag flips only take effect after RP.rasterize_batch_pallas
.clear_cache() — without it a second outer jit re-uses the inner trace
and silently A/Bs identical programs (an earlier probe fell for this).

Each variant is parity-checked (bitwise IMAGE) against base, then timed
in alternating rounds to damp within-session drift. Run from repo root.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import artiboost_tpu.ops.rasterizer_pallas as RP
from probe_lod import B, make_loader, timed

VARIANTS = {
    "base": dict(planar=False, nowpos=False),
    "planar": dict(planar=True, nowpos=False),
    "nowpos": dict(planar=False, nowpos=True),
    "both": dict(planar=True, nowpos=True),
}


def main():
    print("devices:", jax.devices(), flush=True)
    loader = make_loader(-1)  # production defaults (LOD auto -> 128)
    gen = loader.generated
    from artiboost_tpu.datasets.hoquery import Queries

    key = jax.random.PRNGKey(7)
    idx = jnp.arange(B, dtype=jnp.int32)
    fns, imgs = {}, {}
    for name, flags in VARIANTS.items():
        RP._PLANAR_UV = flags["planar"]
        RP._SKIP_WPOS = flags["nowpos"]
        RP.rasterize_batch_pallas.clear_cache()
        f = jax.jit(loader.synth_batch_fn)
        out = f(key, gen, idx)
        imgs[name] = np.asarray(out[Queries.IMAGE])
        fns[name] = f
    RP._PLANAR_UV = False
    RP._SKIP_WPOS = False
    RP.rasterize_batch_pallas.clear_cache()

    for name in ("planar", "nowpos", "both"):
        d = np.abs(imgs[name].astype(np.float64)
                   - imgs["base"].astype(np.float64))
        print(json.dumps({"parity_vs_base": name,
                          "max_abs": float(d.max()),
                          "frac_diff": float((d > 0).mean())}), flush=True)

    for rnd in range(2):
        for name, f in fns.items():
            t = timed(f, gen)
            print(json.dumps({"round": rnd, "variant": name,
                              "synth_ms": round(t * 1e3, 1),
                              "img_per_sec": round(B / t, 1)}), flush=True)


if __name__ == "__main__":
    main()
