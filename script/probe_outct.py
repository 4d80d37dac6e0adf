#!/usr/bin/env python
"""On-chip A/B: channel-transposed raster output block (out_ct) vs the
original (TP, 4) layout, on the production synth pipeline.

Hypothesis: the ~12 us/grid-step fixed cost is dominated by the output
DMA shape — the (sub_k*tile_px, 4) block uses 4 of 128 lanes, so each
grid step's block->HBM DMA is thousands of 16-byte rows. out_ct makes
the block (4*sub_k, tile_px): dense, lane-aligned, one contiguous DMA —
at the price of one (TP, 4)->(4, TP) in-kernel relayout per subtile.

Usage: probe_outct.py [tile:sub_k ...]  (default 512:4 512:8 512:16)
Each config is timed with out_ct on AND off in the same process.
"""
import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from artiboost_tpu.artiboost import renderer as renderer_mod
from probe_lod import B, make_loader, timed

ORIG = renderer_mod.rasterize_batch_pallas


def main():
    print("devices:", jax.devices(), flush=True)
    configs = ([tuple(int(x) for x in a.split(":")) for a in sys.argv[1:]]
               or [(512, 4), (512, 8), (512, 16)])
    gen = None
    for tile_px, sub_k in configs:
        for out_ct in (True, False):
            renderer_mod.rasterize_batch_pallas = partial(ORIG, out_ct=out_ct)
            try:
                loader = make_loader(256, tile_px, sub_k)
                if gen is None:
                    gen = loader.generated
                t = timed(jax.jit(loader.synth_batch_fn), gen)
            except Exception as e:  # Mosaic lowering may reject the relayout
                print(json.dumps({"tile_px": tile_px, "sub_k": sub_k,
                                  "out_ct": out_ct,
                                  "error": repr(e)[:200]}), flush=True)
                continue
            finally:
                renderer_mod.rasterize_batch_pallas = ORIG
            print(json.dumps({"tile_px": tile_px, "sub_k": sub_k,
                              "out_ct": out_ct,
                              "synth_ms": round(t * 1e3, 1),
                              "img_per_sec": round(B / t, 1)}), flush=True)


if __name__ == "__main__":
    main()
