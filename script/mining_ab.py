#!/usr/bin/env python
"""Mining A/B (VERDICT r2 item 5): does CCV reweighting actually improve
accuracy over uniform sampling? The reference's reason to exist is the
claim that it does (``anakin/artiboost/artiboost_loader.py:503-598``);
this runs the claim on the synthetic smoke config with everything else
held fixed (same seeds, same epochs, same model/optimizer).

    python script/mining_ab.py [--epochs 30] [--seeds 1 2] \
        [--methods method_1 method_4 uniform]

Per run it reports:
  * final test Mean3DEPE (mm) on the held-out synthetic test split,
  * the per-triplet val-EPE distribution (p10/p50/p90/max over seen
    triplets) at the last epoch — mining should compress the tail.

Results land in one JSON line per run; paste the table into docs/PERF.md.
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

import artiboost_tpu.datasets  # noqa: F401
from artiboost_tpu.artiboost import ArtiBoostLoader
from artiboost_tpu.criterions import build_criterion
from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.metrics import build_evaluator
from artiboost_tpu.metrics.val_metric import ValMetricMean3DEPE2
from artiboost_tpu.models import build_arch
from artiboost_tpu.parallel import (
    build_optimizer,
    create_train_state,
    make_eval_step,
    make_fused_train_step,
)
from artiboost_tpu.utils.config import load_config
from artiboost_tpu.utils.logger import logger
from artiboost_tpu.utils.misc import TrainMode
from artiboost_tpu.utils.registry import DATASET, build_from_cfg

CFG = "config/mining_ab.yaml"


def run_variant(method: str, seed: int, epochs: int, test_data, cfg_base):
    from train.train_artiboost import epoch_pass, _host_loader

    cfg = json.loads(json.dumps(cfg_base))  # deep copy
    cfg["TRAIN"]["MANUAL_SEED"] = seed
    cfg["TRAIN"]["EPOCH"] = epochs
    cfg["MANAGER"]["UPDATE_METHOD"] = method
    data_preset = cfg["DATA_PRESET"]
    batch_size = int(cfg["TRAIN"]["BATCH_SIZE"])

    train_data = build_from_cfg(cfg["DATASET"]["TRAIN"], DATASET,
                                {"DATA_PRESET": data_preset})
    arch = build_arch(cfg["ARCH"], data_preset)
    criterion = build_criterion(cfg)
    manager_cfg = dict(cfg["MANAGER"])
    manager_cfg["DATA_PRESET"] = data_preset
    evaluator = build_evaluator(cfg.get("EVALUATOR", []), data_preset)
    test_evaluator = build_evaluator(
        [m for m in cfg.get("EVALUATOR", [])
         if not m["TYPE"].startswith("ValMetric")], data_preset)

    loader = ArtiBoostLoader(real_dataset=train_data, cfg=manager_cfg,
                             batch_size=batch_size, n_epochs=epochs, seed=seed)
    optimizer, _ = build_optimizer(cfg["TRAIN"])
    rng = jax.random.PRNGKey(seed)
    loader.prepare()
    from train.train_artiboost import _ensure_synth_ids, _to_device_batch

    init_batch = _ensure_synth_ids(_to_device_batch(next(iter(loader))))
    rng, init_key = jax.random.split(rng)
    state = create_train_state(arch, optimizer, init_batch, init_key)
    train_step = None
    fused_step = make_fused_train_step(arch, criterion, optimizer,
                                       loader.synth_batch_fn, mesh=None)
    from artiboost_tpu.parallel import make_train_step

    train_step = make_train_step(arch, criterion, optimizer, mesh=None)
    eval_step = make_eval_step(arch, criterion, mesh=None)

    t0 = time.time()
    val_dist = None
    for epoch in range(epochs):
        loader.prepare()
        state, rng = epoch_pass(TrainMode.TRAIN, loader, state, train_step,
                                evaluator, rng, None, epoch, None,
                                fused_step=fused_step, artiboost_loader=loader)
        if loader.should_val(epoch):
            loader.prepare_val()
            from train.train_artiboost import _WithLen

            val_loader = _WithLen(loader.iter_val(), loader.len_val())
            _, rng = epoch_pass(TrainMode.VAL, val_loader, state, eval_step,
                                evaluator, rng, None, epoch, None)
        # capture the last-epoch per-triplet distribution BEFORE reweight
        if epoch == epochs - 1:
            for metric in evaluator.metrics_list:
                if isinstance(metric, ValMetricMean3DEPE2):
                    vmap, seen = metric.get_averaged_maps()
                    vals = np.asarray(vmap)[np.asarray(seen)]
                    if vals.size:
                        val_dist = {
                            "n_seen": int(vals.size),
                            "p10": float(np.percentile(vals, 10)),
                            "p50": float(np.percentile(vals, 50)),
                            "p90": float(np.percentile(vals, 90)),
                            "max": float(vals.max()),
                            "mean": float(vals.mean()),
                        }
        loader.step_eval(epoch, evaluator)

    # final test pass
    test_loader = list(_host_loader(test_data, batch_size))
    _, rng = epoch_pass(TrainMode.TEST, test_loader, state, eval_step,
                        test_evaluator, rng, None, epochs, None)
    measures = {}
    for metric in test_evaluator.metrics_list:
        measures.update(metric.get_measures())
    loader.synth_shutdown()
    row = {
        "method": method,
        "seed": seed,
        "epochs": epochs,
        "train_s": round(time.time() - t0, 1),
        "test_joints_mepe_mm": round(float(
            measures.get("joints_3d_abs_mepe", float("nan"))), 3),
        "test_corners_mepe_mm": round(float(
            measures.get("corners_3d_abs_mepe", float("nan"))), 3),
        "val_epe_dist_mm": {k: round(v, 2) for k, v in (val_dist or {}).items()},
        "final_weight_spread": round(float(
            np.asarray(loader.ccv.sample_weight_map).std()), 4),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--seeds", type=int, nargs="+", default=[1, 2])
    ap.add_argument("--methods", nargs="+",
                    default=["method_1", "method_4", "uniform"])
    ap.add_argument("--cfg", default=CFG)
    arg = ap.parse_args()

    cfg = load_config(arg.cfg)
    test_data = build_from_cfg(cfg["DATASET"]["TEST"], DATASET,
                               {"DATA_PRESET": cfg["DATA_PRESET"]})
    rows = []
    for seed in arg.seeds:
        for method in arg.methods:
            logger.info(f"=== mining A/B: {method} seed {seed} ===")
            rows.append(run_variant(method, seed, arg.epochs, test_data, cfg))
    print("=== SUMMARY ===")
    for m in arg.methods:
        sel = [r for r in rows if r["method"] == m]
        mj = np.mean([r["test_joints_mepe_mm"] for r in sel])
        mc = np.mean([r["test_corners_mepe_mm"] for r in sel])
        print(json.dumps({"method": m, "mean_test_joints_mepe_mm": round(float(mj), 3),
                          "mean_test_corners_mepe_mm": round(float(mc), 3),
                          "n_runs": len(sel)}))


if __name__ == "__main__":
    main()
