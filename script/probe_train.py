#!/usr/bin/env python
"""Train-step cost attribution on the real chip (probe6-style splits).

The fused mixed-train number is bounded by raster (~95ms @B=128) + the
train step (~31ms). This probe splits the 31ms: fwd vs bwd vs criterion
vs optimizer vs backbone vs heads, plus batch-size scaling, to find
whether the step itself has headroom (4,136 img/s bf16 is ~23% of the
v5e MXU peak for ResNet34's FLOPs).

Each variant is its own jit; inputs vary per rep (tunnel caches);
scalar-fetch per rep; the 28ms dispatch floor is subtracted once per rep.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from artiboost_tpu.criterions import build_criterion
from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.models import build_arch
from artiboost_tpu.parallel import build_optimizer, create_train_state
from artiboost_tpu.utils.config import load_config

DISPATCH_FLOOR = 0.028


def make_batch(B, rng):
    intr = np.tile(np.array([[435.0, 0, 112], [0, 435.0, 112], [0, 0, 1]],
                            np.float32), (B, 1, 1))
    return {
        Queries.IMAGE: jnp.asarray(rng.rand(B, 224, 224, 3).astype(np.float32)),
        Queries.ROOT_JOINT: jnp.asarray(np.tile([0, 0, 0.5], (B, 1)).astype(np.float32)),
        Queries.CAM_INTR: jnp.asarray(intr),
        Queries.CORNERS_CAN: jnp.asarray(rng.randn(B, 8, 3).astype(np.float32) * 0.05),
        Queries.JOINTS_3D: jnp.asarray(rng.randn(B, 21, 3).astype(np.float32) * 0.05),
        Queries.CORNERS_3D: jnp.asarray(rng.randn(B, 8, 3).astype(np.float32) * 0.05),
        Queries.JOINTS_VIS: jnp.ones((B, 21)),
        Queries.CORNERS_VIS: jnp.ones((B, 8)),
    }


def timed(fn, args_of_rep, reps=5, warm=2):
    for w in range(warm):
        out = fn(*args_of_rep(-1 - w))
    float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    argsets = [args_of_rep(r) for r in range(reps)]
    # the tunnel uploads lazily: FORCE every arg leaf resident before the
    # clock starts, else per-rep host constants (~20ms upload each) pollute
    # the measurement
    seen = set()
    for a in argsets:
        for leaf in jax.tree_util.tree_leaves(a):
            if hasattr(leaf, "dtype") and id(leaf) not in seen:
                seen.add(id(leaf))
                float(jnp.ravel(leaf)[0])
    t0 = time.time()
    for a in argsets:
        out = fn(*a)
        float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    return (time.time() - t0) / reps - DISPATCH_FLOOR


def main():
    cfg = load_config("config/ho3dv2_clasbased_artiboost.yaml")
    arch_cfg = dict(cfg["ARCH"])
    arch_cfg["DTYPE"] = "bfloat16"
    arch = build_arch(arch_cfg, cfg["DATA_PRESET"])
    criterion = build_criterion(cfg)
    optimizer, _ = build_optimizer(cfg["TRAIN"])
    rng = np.random.RandomState(0)
    results = {}

    for B in (128, 256):
        batch = make_batch(B, rng)
        state = create_train_state(arch, optimizer, batch, jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)

        # --- full step (fwd + criterion + bwd + adam), donated ---
        from artiboost_tpu.parallel import make_train_step
        step = make_train_step(arch, criterion, optimizer, mesh=None)

        # the step donates its state arg: feed it a COPY so the original
        # buffers survive for the later probes
        st = jax.tree_util.tree_map(lambda x: x + 0 if hasattr(x, "dtype") else x,
                                    state)
        for _ in range(2):
            st, _, losses = step(st, batch, key)
        float(losses["final_loss"])
        t0 = time.time()
        reps = 5
        for r in range(reps):
            st, _, losses = step(st, batch, key)
            float(losses["final_loss"])
        dt = (time.time() - t0) / reps - DISPATCH_FLOOR
        results[f"full_step_B{B}"] = dt

        if B != 128:
            continue

        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats

        # --- forward only (train-mode, criterion included, no grad) ---
        @jax.jit
        def fwd_crit(params, batch, key, seed):
            v = {"params": params}
            if state.batch_stats:
                v["batch_stats"] = state.batch_stats
            b = dict(batch)
            b[Queries.IMAGE] = b[Queries.IMAGE] + seed
            out = arch.apply(v, b, train=True,
                             mutable=["batch_stats"] if state.batch_stats else [])
            preds, _ = out if isinstance(out, tuple) else (out, {})
            total, _ = criterion.compute_losses(preds, b, key)
            return total

        results["fwd_crit_B128"] = timed(
            fwd_crit, lambda r: (state.params, batch, key,
                                 jnp.float32(0.001 * (r + 1))))

        # --- fwd + bwd, no optimizer update ---
        @jax.jit
        def fwdbwd(params, batch, key, seed):
            def loss_fn(p):
                v = {"params": p}
                if state.batch_stats:
                    v["batch_stats"] = state.batch_stats
                b = dict(batch)
                b[Queries.IMAGE] = b[Queries.IMAGE] + seed
                out = arch.apply(v, b, train=True,
                                 mutable=["batch_stats"] if state.batch_stats else [])
                preds, _ = out if isinstance(out, tuple) else (out, {})
                total, _ = criterion.compute_losses(preds, b, key)
                return total
            g = jax.grad(loss_fn)(params)
            return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

        results["fwdbwd_B128"] = timed(
            fwdbwd, lambda r: (state.params, batch, key,
                               jnp.float32(0.001 * (r + 1))))

        # --- fwd + bwd with a trivial loss (no criterion in the graph) ---
        @jax.jit
        def fwdbwd_nocrit(params, batch, seed):
            def loss_fn(p):
                v = {"params": p}
                if state.batch_stats:
                    v["batch_stats"] = state.batch_stats
                b = dict(batch)
                b[Queries.IMAGE] = b[Queries.IMAGE] + seed
                out = arch.apply(v, b, train=True,
                                 mutable=["batch_stats"] if state.batch_stats else [])
                preds, _ = out if isinstance(out, tuple) else (out, {})
                return jnp.sum(preds["joints_3d_abs"].astype(jnp.float32)) \
                    + jnp.sum(preds["corners_3d_abs"].astype(jnp.float32))
            g = jax.grad(loss_fn)(params)
            return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

        results["fwdbwd_nocrit_B128"] = timed(
            fwdbwd_nocrit, lambda r: (state.params, batch,
                                      jnp.float32(0.001 * (r + 1))))

        # --- backbone only, fwd + bwd ---
        hb = arch.model_list[0]          # HybridBaseline
        backbone = hb.backbone
        hb_params = state.params["model_list_0"]
        hb_stats = (state.batch_stats or {}).get("model_list_0", {})

        @jax.jit
        def bb_fwdbwd(bb_params, image, seed):
            def loss_fn(p):
                v = {"params": p}
                if "backbone" in hb_stats:
                    v["batch_stats"] = hb_stats["backbone"]
                out = backbone.apply(v, image + seed, train=True,
                                     mutable=["batch_stats"] if "backbone" in hb_stats else [])
                feats, _ = out if isinstance(out, tuple) else (out, {})
                return jnp.sum(feats["res_layer4"].astype(jnp.float32))
            g = jax.grad(loss_fn)(bb_params)
            return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

        results["backbone_fwdbwd_B128"] = timed(
            bb_fwdbwd, lambda r: (hb_params["backbone"],
                                  batch[Queries.IMAGE],
                                  jnp.float32(0.001 * (r + 1))))

        # --- backbone + integral head, fwd + bwd (no box head / lifting) ---
        head = hb.hybrid_head

        @jax.jit
        def bbhead_fwdbwd(bb_params, head_params, image, seed):
            def loss_fn(ps):
                v = {"params": ps[0]}
                if "backbone" in hb_stats:
                    v["batch_stats"] = hb_stats["backbone"]
                out = backbone.apply(v, image + seed, train=True,
                                     mutable=["batch_stats"] if "backbone" in hb_stats else [])
                feats, _ = out if isinstance(out, tuple) else (out, {})
                hv = {"params": ps[1]}
                if "hybrid_head" in hb_stats:
                    hv["batch_stats"] = hb_stats["hybrid_head"]
                hout = head.apply(
                    hv, feats["res_layer4"], train=True,
                    mutable=["batch_stats"] if "hybrid_head" in hb_stats else [])
                pose, _ = hout if isinstance(hout, tuple) else (hout, {})
                return jnp.sum(pose["kp3d"].astype(jnp.float32))
            g = jax.grad(loss_fn)((bb_params, head_params))
            return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

        results["bb_head_fwdbwd_B128"] = timed(
            bbhead_fwdbwd,
            lambda r: (hb_params["backbone"], hb_params["hybrid_head"],
                       batch[Queries.IMAGE], jnp.float32(0.001 * (r + 1))))

        # --- optimizer update alone (grads := params) ---
        opt_state0 = state.opt_state

        @jax.jit
        def adam_only(params, opt_state, seed):
            import optax
            g = jax.tree_util.tree_map(lambda x: x * seed, params)
            updates, new_opt = optimizer.update(g, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(new_params))

        results["adam_only"] = timed(
            adam_only, lambda r: (state.params, opt_state0,
                                  jnp.float32(0.001 * (r + 1))))

    B = 128
    out = {k: round(v * 1000, 2) for k, v in results.items()}
    out["img_per_sec_full_B128"] = round(128 / results["full_step_B128"], 1)
    out["img_per_sec_full_B256"] = round(256 / results["full_step_B256"], 1)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
