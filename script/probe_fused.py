#!/usr/bin/env python
"""On-chip fused mixed-train throughput vs renderer config (round 4):
LOD budget x tex_subsample, via bench.bench_mixed_train.

Usage: probe_fused.py [lod:sub ...]  (default 256:1 256:2 128:2)
Run from the repo root.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from artiboost_tpu.utils.config import load_config
from bench import bench_mixed_train


def main():
    print("devices:", jax.devices(), flush=True)
    configs = ([tuple(int(x) for x in a.split(":")) for a in sys.argv[1:]]
               or [(256, 1), (256, 2), (128, 2)])
    for lod, sub in configs:
        cfg = load_config("config/ho3dv2_clasbased_artiboost.yaml")
        rend = dict(cfg["MANAGER"].get("RENDERER", {}))
        rend["LOD_FACES"] = lod
        rend["TEX_SUBSAMPLE"] = sub
        cfg["MANAGER"] = dict(cfg["MANAGER"], RENDERER=rend)
        img_s = bench_mixed_train(cfg)
        print(json.dumps({"lod": lod, "tex_subsample": sub,
                          "mixed_train_img_per_sec": img_s}), flush=True)


if __name__ == "__main__":
    main()
