#!/usr/bin/env python
"""On-chip A/B: fused (render-in-program) vs pipelined (double-buffered)
mixed train step, batch-size scaling, and quad-rate raster (RENDER_SCALE).

VERDICT r4 items 1, 4, 7. Run from the repo root:
    PYTHONPATH=/root/repo:/root/.axon_site python script/probe_pipeline.py

Timing: K chained steps dispatched async, ONE scalar fetch at the end
(state chains step-to-step, renders chain into trains, so the final
fetch forces the whole queue on the lazy tunnel); one 28 ms dispatch
floor subtracted per timing loop, best of 2 loops.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from artiboost_tpu.artiboost.loader import ArtiBoostLoader
from artiboost_tpu.criterions import build_criterion
from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.models import build_arch
from artiboost_tpu.parallel import (build_optimizer, create_train_state,
                                    make_fused_train_step,
                                    make_mixed_train_step)
from artiboost_tpu.utils.config import load_config

K_REPS = 8
SYNTH_FRAC = 0.6


def make_loader(cfg, B, render_scale=1):
    manager_cfg = dict(cfg["MANAGER"])
    manager_cfg["DATA_PRESET"] = cfg.get("DATA_PRESET", {})
    manager_cfg["CONFIG_LEN_TRAIN"] = 512
    manager_cfg["OPG_BATCH_SIZE"] = 512
    rend = dict(manager_cfg.get("RENDERER", {}))
    rend["RENDER_SCALE"] = render_scale
    manager_cfg["RENDERER"] = rend
    loader = ArtiBoostLoader(real_dataset=None, cfg=manager_cfg, batch_size=B,
                             seed=0)
    loader.prepare()
    return loader


def make_real(B, n_synth, rng):
    n_real = B - n_synth
    intr = np.tile(np.array([[435.0, 0, 112], [0, 435.0, 112], [0, 0, 1]],
                            np.float32), (n_real, 1, 1))
    return {
        Queries.IMAGE: jnp.asarray(rng.rand(n_real, 224, 224, 3).astype(np.float32)),
        Queries.ROOT_JOINT: jnp.asarray(np.tile([0, 0, 0.5], (n_real, 1)).astype(np.float32)),
        Queries.CAM_INTR: jnp.asarray(intr),
        Queries.CORNERS_CAN: jnp.asarray(rng.randn(n_real, 8, 3).astype(np.float32) * 0.05),
        Queries.JOINTS_3D: jnp.asarray(rng.randn(n_real, 21, 3).astype(np.float32) * 0.05),
        Queries.CORNERS_3D: jnp.asarray(rng.randn(n_real, 8, 3).astype(np.float32) * 0.05),
        Queries.JOINTS_VIS: jnp.ones((n_real, 21)),
        Queries.CORNERS_VIS: jnp.ones((n_real, 8)),
    }


def bench_mode(cfg, mode, B, render_scale=1):
    loader = make_loader(cfg, B, render_scale)
    gen = loader.generated
    arch_cfg = dict(cfg["ARCH"])
    arch_cfg["DTYPE"] = "bfloat16"
    arch = build_arch(arch_cfg, cfg["DATA_PRESET"])
    criterion = build_criterion(cfg)
    optimizer, _ = build_optimizer(cfg["TRAIN"])

    n_synth = int(round(B * SYNTH_FRAC))
    rng = np.random.RandomState(0)
    real_batch = make_real(B, n_synth, rng)
    state = create_train_state(arch, optimizer, dict(real_batch),
                               jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    sidx0 = jnp.arange(n_synth, dtype=jnp.int32)
    N = 512  # pose-cache length

    if mode == "fused":
        step = make_fused_train_step(arch, criterion, optimizer,
                                     loader.synth_batch_fn, mesh=None)
        for r in range(2):  # compile + donated respecialization
            state, _, losses, _ = step(state, real_batch, gen,
                                       (sidx0 + r) % N, key)
        float(losses["final_loss"])

        def run(loop):
            nonlocal state
            t0 = time.time()
            for r in range(K_REPS):
                state, _, losses, _ = step(
                    state, real_batch, gen,
                    (sidx0 + 7 * (loop * K_REPS + r + 1)) % N, key)
            float(losses["final_loss"])
            return time.time() - t0 - 0.028
    else:  # pipelined
        render = loader._synth_batch_jit
        step = make_mixed_train_step(arch, criterion, optimizer, mesh=None)
        for r in range(2):
            synth = render(key, gen, (sidx0 + r) % N)
            state, _, losses, _ = step(state, real_batch, synth, key)
        float(losses["final_loss"])

        def run(loop):
            nonlocal state
            # double-buffer: render r+1 is dispatched before train r
            pending = render(key, gen, sidx0 % N)
            t0 = time.time()
            for r in range(K_REPS):
                synth = pending
                pending = render(key, gen,
                                 (sidx0 + 7 * (loop * K_REPS + r + 1)) % N)
                state, _, losses, _ = step(state, real_batch, synth, key)
            float(losses["final_loss"])
            return time.time() - t0 - 0.028

    dts = [run(loop) / K_REPS for loop in range(2)]
    dt = min(dts)
    return B / dt, dt * 1e3


def image_delta(cfg, B=64):
    """Mean abs image delta + changed-pixel fraction, RENDER_SCALE 2 vs 1
    (same seed -> same poses, aug, backgrounds; only the raster differs)."""
    outs = []
    for rs in (1, 2):
        loader = make_loader(cfg, B, render_scale=rs)
        batch = loader._synth_batch_jit(jax.random.PRNGKey(5), loader.generated,
                                        jnp.arange(B, dtype=jnp.int32))
        outs.append(np.asarray(batch[Queries.IMAGE], np.float32) + 0.5)
    d = np.abs(outs[0] - outs[1])
    return float(d.mean()), float((d.max(axis=-1) > 2.0 / 255.0).mean())


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", nargs="+", default=["fused", "pipelined"])
    ap.add_argument("--batches", type=int, nargs="+", default=[128, 256])
    ap.add_argument("--scales", type=int, nargs="+", default=[1, 2])
    ap.add_argument("--delta", action="store_true",
                    help="also measure the rs=2 vs rs=1 image delta")
    arg = ap.parse_args()

    cfg = load_config("config/ho3dv2_clasbased_artiboost.yaml")
    print(f"devices: {jax.devices()}", flush=True)
    for rs in arg.scales:
        for mode in arg.modes:
            for B in arg.batches:
                ips, ms = bench_mode(cfg, mode, B, render_scale=rs)
                print(f"{mode:9s} B={B:3d} rs={rs}: {ms:7.1f} ms/step  "
                      f"{ips:7.1f} img/s", flush=True)
    if arg.delta:
        mean_d, frac = image_delta(cfg)
        print(f"render_scale=2 vs 1: mean abs image delta {mean_d:.4f}, "
              f"pixels > 2/255: {frac:.1%}", flush=True)


if __name__ == "__main__":
    main()
