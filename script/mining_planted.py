#!/usr/bin/env python
"""Planted-hard-region mining experiments (VERDICT r3 item 3a, r4 item 2).

Two plant modes, selected by ``--plant``:

``noise`` (round 4): object 0 x the first quarter of the view sphere
gets independent N(0, sigma) noise added to its joint/corner TARGETS in
both train and val synthesis. The model cannot fit the noise, so the
region's val EPE is elevated by construction — this proves the loop
CONCENTRATES (method_1: 1.324+-0.035 weight-mass ratio vs uniform's
exact 1.000, docs/mining_planted_r4_e20.log) but cannot show an
accuracy payoff: no amount of extra sampling learns label noise.

``withhold`` (round 5, VERDICT r4 item 2 — a LEARNABLE plant): ALL of
object 0 is masked out of the TRAIN synthesis draw for the first
``--release_frac`` of epochs (the val sweep, which draws uniformly and
ignores the weight map, still measures it), then released. Its
supervision is correct — the model simply hasn't seen it, and object
corner geometry does not generalize from the other objects. After
release, mining (which by then has val-observed the region's high EPE
and banked weight on it) must drive the region's val EPE down FASTER
than the uniform control: the paired per-seed delta of final region EPE
is the accuracy payoff the paper claims for the mining loop
(``anakin/artiboost/artiboost_loader.py:503-598`` exists to improve
accuracy, not weight maps).

``offset`` (round 5): object 0's joint/corner targets get a FIXED
offset vector of magnitude ``--sigma`` meters (train AND val) — fully
learnable, but only from object-0 samples (other objects don't carry
the offset, so generalization can't remove it). Unlike ``withhold``,
the region's val-EPE contrast is CONTROLLABLE: set it above the
per-triplet val-noise floor that masks the withhold plant's ~10 mm
signal (measured round 5), and the mining loop has something it can
actually see.

All modes: real model, real fused training, real per-triplet val maps,
real reweight, >= 4 seeds, 95% CIs, paired deltas when the seed sets
match.

    python script/mining_planted.py --plant withhold [--epochs 24] \
        [--seeds 1 2 3 4] [--methods method_1 uniform] [--val_len 384]

One JSON line per run + a summary with per-method CIs.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import artiboost_tpu.datasets  # noqa: F401
from artiboost_tpu.artiboost import ArtiBoostLoader
from artiboost_tpu.criterions import build_criterion
from artiboost_tpu.datasets.hoquery import Queries, SynthQueries
from artiboost_tpu.metrics import build_evaluator
from artiboost_tpu.metrics.val_metric import ValMetricMean3DEPE2
from artiboost_tpu.models import build_arch
from artiboost_tpu.parallel import (
    build_optimizer,
    create_train_state,
    make_eval_step,
    make_fused_train_step,
    make_train_step,
)
from artiboost_tpu.utils.config import load_config
from artiboost_tpu.utils.logger import logger
from artiboost_tpu.utils.misc import TrainMode
from artiboost_tpu.utils.registry import DATASET, build_from_cfg

CFG = "config/mining_ab.yaml"

# planted region: object 0 x first quarter of the view bins (all grasps)
HARD_OBJ = 0


def region_mask_fn(n_persp):
    v_cut = n_persp // 4

    def mask(obj_id, persp_id):
        return (obj_id == HARD_OBJ) & (persp_id < v_cut)

    return mask, v_cut


def corrupt_wrap(synth_fn, v_cut, sigma, seed):
    """Wrap a synth-batch fn: triplets in the planted region get
    N(0, sigma) noise added to their 3D supervision targets (train AND
    val — the region is hard by construction, the model cannot fit it)."""

    @jax.jit
    def corrupted(key, gen, sidx):
        batch = synth_fn(key, gen, sidx)
        hard = ((batch[SynthQueries.OBJ_ID] == HARD_OBJ)
                & (batch[SynthQueries.PERSP_ID] < v_cut))
        nk = jax.random.fold_in(key, seed + 7919)
        k1, k2 = jax.random.split(nk)
        jn = jax.random.normal(k1, batch[Queries.JOINTS_3D].shape) * sigma
        cn = jax.random.normal(k2, batch[Queries.CORNERS_3D].shape) * sigma
        m = hard[:, None, None].astype(jnp.float32)
        batch = dict(batch)
        batch[Queries.JOINTS_3D] = batch[Queries.JOINTS_3D] + jn * m
        batch[Queries.CORNERS_3D] = batch[Queries.CORNERS_3D] + cn * m
        return batch

    return corrupted


def offset_wrap(synth_fn, offset_m):
    """The LEARNABLE plant with controllable contrast: object 0's joint
    and corner targets get a FIXED offset vector (train AND val — fully
    consistent supervision). The model can only learn it by seeing
    object-0 samples and conditioning on the object's appearance;
    cross-object generalization CANNOT remove the error, so the region's
    val EPE stays ~|offset| above the rest until region samples teach
    it. Contrast is set by --offset_mm, i.e. ABOVE the per-triplet
    val-noise floor that masks the withhold plant's signal."""
    off = jnp.asarray([0.48, 0.64, 0.6]) * offset_m  # |off| = offset_m

    @jax.jit
    def corrupted(key, gen, sidx):
        batch = synth_fn(key, gen, sidx)
        m = (batch[SynthQueries.OBJ_ID] == HARD_OBJ) \
            .astype(jnp.float32)[:, None, None]
        batch = dict(batch)
        batch[Queries.JOINTS_3D] = batch[Queries.JOINTS_3D] + off * m
        batch[Queries.CORNERS_3D] = batch[Queries.CORNERS_3D] + off * m
        return batch

    return corrupted


def run_variant(method, seed, epochs, sigma, cfg_base, plant="noise",
                release_epoch=0, val_len=None, dist_thresholds=None):
    from train.train_artiboost import (_WithLen, _ensure_synth_ids,
                                       _to_device_batch, epoch_pass)

    cfg = json.loads(json.dumps(cfg_base))
    cfg["TRAIN"]["MANUAL_SEED"] = seed
    cfg["TRAIN"]["EPOCH"] = epochs
    cfg["MANAGER"]["UPDATE_METHOD"] = method
    if val_len:
        cfg["MANAGER"]["VAL_LEN"] = int(val_len)
    if dist_thresholds:
        cfg["MANAGER"]["DIST_THRESHOLD"] = {
            "LOWER": float(dist_thresholds[0]),
            "UPPER": float(dist_thresholds[1])}
    data_preset = cfg["DATA_PRESET"]
    batch_size = int(cfg["TRAIN"]["BATCH_SIZE"])

    train_data = build_from_cfg(cfg["DATASET"]["TRAIN"], DATASET,
                                {"DATA_PRESET": data_preset})
    arch = build_arch(cfg["ARCH"], data_preset)
    criterion = build_criterion(cfg)
    manager_cfg = dict(cfg["MANAGER"])
    manager_cfg["DATA_PRESET"] = data_preset
    evaluator = build_evaluator(cfg.get("EVALUATOR", []), data_preset)

    loader = ArtiBoostLoader(real_dataset=train_data, cfg=manager_cfg,
                             batch_size=batch_size, n_epochs=epochs, seed=seed)
    O, V, G = loader.ccv.shape
    if plant == "noise":
        mask_fn, v_cut = region_mask_fn(V)
        # corrupt BOTH the fused-train synthesis and the val synthesis
        corrupted = corrupt_wrap(loader.synth_batch_fn, v_cut, sigma, seed)
        loader._synth_batch_jit = corrupted
    elif plant == "offset":  # learnable + controllable contrast
        def mask_fn(obj_id, persp_id):
            return obj_id == HARD_OBJ

        corrupted = offset_wrap(loader.synth_batch_fn, sigma)
        loader._synth_batch_jit = corrupted
    else:  # withhold: the LEARNABLE plant — supervision untouched, the
        # region (all of object 0) simply excluded from the train draw
        # until release_epoch; val draws uniformly and still measures it
        def mask_fn(obj_id, persp_id):
            return obj_id == HARD_OBJ

        corrupted = loader.synth_batch_fn

    optimizer, _ = build_optimizer(cfg["TRAIN"])
    rng = jax.random.PRNGKey(seed)
    loader.prepare()
    init_batch = _ensure_synth_ids(_to_device_batch(next(iter(loader))))
    rng, init_key = jax.random.split(rng)
    state = create_train_state(arch, optimizer, init_batch, init_key)
    fused_step = make_fused_train_step(arch, criterion, optimizer,
                                       corrupted, mesh=None)
    train_step = make_train_step(arch, criterion, optimizer, mesh=None)
    eval_step = make_eval_step(arch, criterion, mesh=None)

    # region bookkeeping
    oid_grid, vid_grid = np.meshgrid(np.arange(O), np.arange(V), indexing="ij")
    region = np.zeros((O, V, G), bool)
    region[np.asarray(mask_fn(oid_grid, vid_grid))] = True
    not_black = ~np.asarray(loader.ccv.blacklist_map).astype(bool)
    region_frac_uniform = float((region & not_black).sum() / not_black.sum())

    region_j = jnp.asarray(region)
    t0 = time.time()
    val_region, val_rest, val_epochs = [], [], []
    region_draw_frac = []  # fraction of the train draw in-region, post-release
    for epoch in range(epochs):
        if plant == "withhold" and epoch < release_epoch:
            # mask the DRAW only — the persistent map stays untouched, so
            # the uniform control recovers instantly at release and the
            # mining arms keep whatever weight they banked from val
            saved = loader.ccv.sample_weight_map
            loader.ccv = loader.ccv._replace(
                sample_weight_map=jnp.where(region_j, 0.0, saved))
            loader.prepare()
            loader.ccv = loader.ccv._replace(sample_weight_map=saved)
        else:
            loader.prepare()
            if plant in ("withhold", "offset"):
                region_draw_frac.append(float(np.mean(
                    np.asarray(loader.generated.obj_id) == HARD_OBJ)))
        state, rng = epoch_pass(TrainMode.TRAIN, loader, state, train_step,
                                evaluator, rng, None, epoch, None,
                                fused_step=fused_step, artiboost_loader=loader)
        if loader.should_val(epoch):
            loader.prepare_val()
            val_loader = _WithLen(loader.iter_val(), loader.len_val())
            _, rng = epoch_pass(TrainMode.VAL, val_loader, state, eval_step,
                                evaluator, rng, None, epoch, None)
            for metric in evaluator.metrics_list:
                if isinstance(metric, ValMetricMean3DEPE2):
                    vmap, seen = metric.get_averaged_maps()
                    vmap, seen = np.asarray(vmap), np.asarray(seen)
                    if (seen & region).any() and (seen & ~region).any():
                        val_region.append(float(vmap[seen & region].mean()))
                        val_rest.append(float(vmap[seen & ~region].mean()))
                        val_epochs.append(epoch)
        loader.step_eval(epoch, evaluator)

    w = np.asarray(loader.ccv.sample_weight_map) * not_black
    region_mass = float(w[region].sum() / max(w.sum(), 1e-9))
    # endpoint: mean of the last 3 post-release val measurements
    # (withhold/offset, where the region EPE falls as it is learned) or
    # the all-epoch mean (noise, where the EPE is stationary)
    if plant in ("withhold", "offset"):
        post = [v for v, e in zip(val_region, val_epochs) if e >= release_epoch]
        post_rest = [v for v, e in zip(val_rest, val_epochs) if e >= release_epoch]
        end_region = float(np.mean(post[-3:])) if post else None
        end_rest = float(np.mean(post_rest[-3:])) if post_rest else None
    else:
        end_region = float(np.mean(val_region)) if val_region else None
        end_rest = float(np.mean(val_rest)) if val_rest else None
    row = {
        "method": method, "seed": seed, "epochs": epochs, "plant": plant,
        "sigma_mm": sigma * 1e3 if plant in ("noise", "offset") else None,
        "release_epoch": release_epoch if plant == "withhold" else None,
        "train_s": round(time.time() - t0, 1),
        "region_frac_uniform": round(region_frac_uniform, 4),
        "region_weight_mass": round(region_mass, 4),
        "mass_ratio_vs_uniform": round(region_mass / region_frac_uniform, 3),
        "val_epe_region_mm": round(end_region, 1) if end_region else None,
        "val_epe_rest_mm": round(end_rest, 1) if end_rest else None,
        "region_draw_frac_post_release": (
            round(float(np.mean(region_draw_frac)), 4)
            if region_draw_frac else None),
        # method_3/4: fraction of val-seen triplets solved below
        # DIST_THRESHOLD.LOWER at the last reweight (-1 = n/a)
        "dist_lower_ratio": round(loader.last_dist_lower_ratio, 4),
        "val_region_traj": [round(v, 1) for v in val_region],
        "val_epochs": val_epochs,
    }
    print(json.dumps(row), flush=True)
    return row


def ci95(xs):
    xs = np.asarray(xs, np.float64)
    if xs.size < 2:
        return float(xs.mean()), 0.0
    # t-multipliers for n-1 df at 95%
    t = {1: 12.71, 2: 4.303, 3: 3.182, 4: 2.776, 5: 2.571, 6: 2.447,
         7: 2.365}.get(xs.size - 1, 2.0)
    return float(xs.mean()), float(t * xs.std(ddof=1) / np.sqrt(xs.size))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3, 4])
    ap.add_argument("--sigma", type=float, default=0.1)
    ap.add_argument("--methods", nargs="+", default=["method_1", "uniform"])
    ap.add_argument("--plant", choices=["noise", "withhold", "offset"],
                    default="noise")
    ap.add_argument("--release_frac", type=float, default=1.0 / 3.0,
                    help="withhold: fraction of epochs before release")
    ap.add_argument("--val_len", type=int, default=None,
                    help="override MANAGER.VAL_LEN (withhold wants denser "
                         "val coverage so mining sees the region's EPE)")
    ap.add_argument("--dist_thresholds", type=float, nargs=2, default=None,
                    metavar=("LOWER", "UPPER"),
                    help="override DIST_THRESHOLD (mm) so method_3's "
                         "deactivate-below-LOWER semantics engage at this "
                         "world's EPE scale")
    arg = ap.parse_args()

    release_epoch = int(round(arg.epochs * arg.release_frac)) \
        if arg.plant == "withhold" else 0
    cfg = load_config(CFG)
    rows = []
    for seed in arg.seeds:
        for method in arg.methods:
            logger.info(f"=== planted mining ({arg.plant}): {method} "
                        f"seed {seed} ===")
            rows.append(run_variant(method, seed, arg.epochs, arg.sigma, cfg,
                                    plant=arg.plant,
                                    release_epoch=release_epoch,
                                    val_len=arg.val_len,
                                    dist_thresholds=arg.dist_thresholds))

    print("=== SUMMARY (95% CI over seeds) ===")
    for m in arg.methods:
        sel = [r for r in rows if r["method"] == m]
        mass_mu, mass_hw = ci95([r["region_weight_mass"] for r in sel])
        ratio_mu, ratio_hw = ci95([r["mass_ratio_vs_uniform"] for r in sel])
        reg = [r["val_epe_region_mm"] for r in sel if r["val_epe_region_mm"]]
        rest = [r["val_epe_rest_mm"] for r in sel if r["val_epe_rest_mm"]]
        print(json.dumps({
            "method": m, "n": len(sel),
            "region_weight_mass": f"{mass_mu:.4f} +- {mass_hw:.4f}",
            "mass_ratio_vs_uniform": f"{ratio_mu:.3f} +- {ratio_hw:.3f}",
            "val_epe_region_mm": round(float(np.mean(reg)), 1) if reg else None,
            "val_epe_rest_mm": round(float(np.mean(rest)), 1) if rest else None,
        }))
    # paired per-seed payoff vs the uniform control (the accuracy claim):
    # positive delta = mining ends with LOWER region EPE than uniform
    uni = {r["seed"]: r for r in rows if r["method"] == "uniform"}
    for m in arg.methods:
        if m == "uniform":
            continue
        deltas = [uni[r["seed"]]["val_epe_region_mm"] - r["val_epe_region_mm"]
                  for r in rows
                  if r["method"] == m and r["seed"] in uni
                  and r["val_epe_region_mm"] and
                  uni[r["seed"]]["val_epe_region_mm"]]
        if deltas:
            mu, hw = ci95(deltas)
            print(json.dumps({
                "paired_delta": f"uniform - {m}", "n": len(deltas),
                "region_epe_improvement_mm": f"{mu:.1f} +- {hw:.1f}",
                "ci_excludes_zero": bool(
                    len(deltas) >= 2 and (mu - hw > 0 or mu + hw < 0)),
            }))


if __name__ == "__main__":
    main()
