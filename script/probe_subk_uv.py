#!/usr/bin/env python
"""On-chip sweep: sub_k / tile_px on the PRODUCTION synth pipeline
(LOD-256 + per-pixel UV texturing, B=128 @224^2).

Motivation: post-UV, the raster is ~57% of the 99 ms synth batch and
LOD scenes have ~4 live chunks, so the ~12 us fixed cost per grid step
(~3.1k steps at sub_k=4) is the dominant raster term — larger sub_k
amortizes it further at the price of looser per-sub-tile y-culling
(each sub-tile keeps its own chunk range, so culling is unchanged;
the real price is VMEM output block size). Tunnel rules per CLAUDE.md.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from probe_lod import B, make_loader, timed


DEFAULT_CONFIGS = ((512, 4), (512, 8), (512, 16), (512, 24),
                   (512, 49), (1024, 4), (1024, 8), (2048, 4),
                   (256, 16))


def main():
    print("devices:", jax.devices(), flush=True)
    # configs from argv as tile:sub_k pairs (the full sweep outlives a
    # 10-min timeout on this host's compile speed — chunk it)
    if len(sys.argv) > 1:
        configs = [tuple(int(x) for x in a.split(":")) for a in sys.argv[1:]]
    else:
        configs = DEFAULT_CONFIGS
    gen = None
    results = []
    for tile_px, sub_k in configs:
        loader = make_loader(256, tile_px, sub_k)
        if gen is None:
            gen = loader.generated
        t = timed(jax.jit(loader.synth_batch_fn), gen)
        row = {"tile_px": tile_px, "sub_k": sub_k,
               "synth_ms": round(t * 1e3, 1), "img_per_sec": round(B / t, 1)}
        results.append(row)
        print(json.dumps(row), flush=True)
    best = min(results, key=lambda r: r["synth_ms"])
    print("BEST:", json.dumps(best))


if __name__ == "__main__":
    main()
