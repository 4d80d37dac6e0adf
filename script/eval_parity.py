#!/usr/bin/env python
"""Ready-to-fire checkpoint-parity harness (VERDICT r2 item 3): point it
at a released reference ``.pth.tar`` + a dataset root and it prints the
MPCPE/MPJPE row to compare against the paper table — one command the day
real assets land on a machine.

    python script/eval_parity.py \
        --cfg config_eval/eval_ho3dv2_clasbased_artiboost.yaml \
        --ckpt checkpoints/artiboost_ho3dv2_clasbased_100e.pth.tar \
        --data_root ./data [--expected_mpcpe 25.3] [--batch_size 100]

What it does: converts the torch checkpoint through the parity-tested
converter table (utils/pretrained.py; full-depth forward A/B in
tests/test_full_parity.py), evaluates the TEST split with the padded
full-coverage loader, and prints Mean3DEPE per key + per-object MPCPE
(the numbers ``exp/submit_*/evaluations`` carries in the reference,
README.md:76-85). Hand MPJPE on HO3D's eval split needs the Codalab
server, exactly as the reference does — use train/submit_reload.py
--submit_dump for the submission zip.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import artiboost_tpu.datasets  # noqa: F401 (registers dataset types)
from artiboost_tpu.criterions import build_criterion
from artiboost_tpu.metrics import build_evaluator
from artiboost_tpu.models import build_arch
from artiboost_tpu.parallel import build_optimizer, create_train_state, make_eval_step
from artiboost_tpu.utils.config import load_config
from artiboost_tpu.utils.logger import logger
from artiboost_tpu.utils.registry import DATASET, build_from_cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--ckpt", required=True, help="released .pth.tar")
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--expected_mpcpe", type=float, default=None,
                    help="paper-row MPCPE (mm) to diff against")
    ap.add_argument("--max_batches", type=int, default=0,
                    help="debug: stop after N batches (0 = full split)")
    arg = ap.parse_args()

    cfg = load_config(arg.cfg)
    cfg["ARCH"]["PRETRAINED"] = arg.ckpt
    if arg.data_root:
        cfg["DATASET"]["TEST"]["DATA_ROOT"] = arg.data_root
    data_preset = cfg["DATA_PRESET"]
    batch_size = arg.batch_size or int(cfg.get("TRAIN", {}).get("BATCH_SIZE", 100))

    test_data = build_from_cfg(cfg["DATASET"]["TEST"], DATASET,
                               {"DATA_PRESET": data_preset})
    arch = build_arch(cfg["ARCH"], data_preset)
    criterion = build_criterion(cfg) if cfg.get("CRITERION") else None
    evaluator = build_evaluator(cfg.get("EVALUATOR", []), data_preset)

    optimizer, _ = build_optimizer(cfg.get("TRAIN", {"LR": 1e-4}))
    sample = test_data.sample_batch(list(range(min(2, len(test_data)))))
    sample = {k: np.asarray(v) for k, v in sample.items()
              if not isinstance(v, (str, list))}
    state = create_train_state(arch, optimizer, sample, jax.random.PRNGKey(0))

    from artiboost_tpu.utils.pretrained import load_arch_pretrained

    state, loaded = load_arch_pretrained(state, cfg["ARCH"])
    if not loaded:
        raise SystemExit(f"checkpoint {arg.ckpt} did not load — aborting "
                         f"(a parity number from random init is meaningless)")

    eval_step = make_eval_step(arch, criterion, mesh=None)
    from artiboost_tpu.datasets.hodata import padded_host_loader

    t0 = time.time()
    key = jax.random.PRNGKey(1)
    n = 0
    for batch in padded_host_loader(test_data, batch_size):
        import jax.numpy as jnp

        batch = {k: jnp.asarray(v) for k, v in batch.items()
                 if not isinstance(v, (str, list))}
        preds, losses = eval_step(state, batch, key)
        evaluator.feed_all(preds, batch, losses)
        n += 1
        if arg.max_batches and n >= arg.max_batches:
            break
    logger.info(f"eval: {n} batches in {time.time() - t0:.1f}s")

    row = {}
    for metric in evaluator.metrics_list:
        row.update(metric.get_measures())
    mpcpe = row.get("corners_3d_abs_mepe") or row.get("MSSD")
    print(json.dumps({k: round(float(v), 3) for k, v in row.items()
                      if isinstance(v, (int, float))}, indent=2))
    if mpcpe is not None:
        line = f"MPCPE (mm): {float(mpcpe):.2f}"
        if arg.expected_mpcpe is not None:
            line += (f"  |  paper row: {arg.expected_mpcpe:.2f}  |  delta: "
                     f"{float(mpcpe) - arg.expected_mpcpe:+.2f} mm")
        print(line)


if __name__ == "__main__":
    main()
