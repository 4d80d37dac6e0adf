#!/usr/bin/env python
"""Train the grasp-validity RefineNet natively (GrabNet replacement).

The reference never trains its refiner — it loads the pretrained GrabNet
checkpoint ``assets/GrabNet/refinenet.pt`` (``anakin/artiboost/refiner.py:165``,
cfg ``config/ho3dv2_clasbased_jlol_artiboost2.yaml:47-50``). Our RefineNet
is a TPU-first re-design, so this script provides the training recipe:
clean grasps from the grasp library are corrupted by the synthesis
scrambler and the unrolled 3-step refinement learns to recover the clean
hand (vertex/joint/contact recovery loss) under random global rotations.

Usage:
    python script/train_refiner.py --steps 2000 --batch 256 \
        --out assets/refinenet_tpu.npz
Then point the train config at it:
    ARTIBOOST: { REFINER: { TYPE: hand_obj, PRETRAINED: assets/refinenet_tpu.npz } }
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from artiboost_tpu.artiboost.grasp_library import get_grasp_library
from artiboost_tpu.artiboost.object_library import get_object_library
from artiboost_tpu.artiboost.refiner import (RefineNet,
                                             make_refiner_train_step,
                                             save_refiner_params)
from artiboost_tpu.artiboost.scrambler import build_scrambler
from artiboost_tpu.mano.model import get_mano_model
from artiboost_tpu.utils.logger import logger


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--n_grasp", type=int, default=50)
    ap.add_argument("--obj_points", type=int, default=2048,
                    help="object surface points fed to the chamfer op")
    ap.add_argument("--scrambler", default="random_2")
    ap.add_argument("--pose_sigma", type=float, default=0.3)
    ap.add_argument("--tsl_sigma", type=float, default=0.02)
    ap.add_argument("--objs", nargs="*", default=None,
                    help="YCB object names (default: the HO3D set)")
    ap.add_argument("--dataset_type", default="HO3D")
    ap.add_argument("--out", default="assets/refinenet_tpu.npz")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log_freq", type=int, default=50)
    args = ap.parse_args()

    objs = args.objs or ["003_cracker_box", "006_mustard_bottle",
                         "010_potted_meat_can", "021_bleach_cleanser"]
    mano = get_mano_model()
    obj_lib = get_object_library(objs, args.dataset_type)
    grasp_lib = get_grasp_library(objs, args.n_grasp)
    scrambler = build_scrambler({"TYPE": args.scrambler,
                                 "HAND_POSE_SIGMA": args.pose_sigma,
                                 "HAND_TSL_SIGMA": args.tsl_sigma})

    # subsample object verts once to bound the chamfer op (refiner.py:170-180
    # resamples to 10k; the matmul-argmin op is happiest at a few thousand)
    rng = np.random.RandomState(args.seed)
    M = min(args.obj_points, obj_lib.v_max)
    sel = rng.choice(obj_lib.v_max, M, replace=False)
    obj_verts_all = jnp.asarray(np.asarray(obj_lib.verts)[:, sel])     # (O, M, 3)
    obj_valid_all = jnp.asarray(np.asarray(obj_lib.vert_valid)[:, sel])  # (O, M)

    net = RefineNet()
    init_fn, step_fn = make_refiner_train_step(
        mano, net, scrambler, n_iters=args.iters, learning_rate=args.lr)
    params, opt_state = init_fn(jax.random.PRNGKey(args.seed))

    key = jax.random.PRNGKey(args.seed + 1)
    t0 = time.time()
    for step in range(args.steps):
        key, k_sample, k_step = jax.random.split(key, 3)
        oid = jax.random.randint(k_sample, (args.batch,), 0, grasp_lib.n_obj)
        gid = jax.random.randint(jax.random.fold_in(k_sample, 1),
                                 (args.batch,), 0, grasp_lib.n_grasp)
        pose, shape, tsl = grasp_lib.gather(oid, gid)
        params, opt_state, metrics = step_fn(
            params, opt_state, k_step, pose, shape, tsl,
            obj_verts_all[oid], obj_valid_all[oid])
        if step % args.log_freq == 0 or step == args.steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            logger.info(
                f"step {step:5d}  loss {m['loss']:.5f}  verts {m['l_verts']:.5f}  "
                f"joints {m['l_joints']:.5f}  contact {m['l_contact']:.5f}  "
                f"({time.time() - t0:.1f}s)")

    save_refiner_params(params, args.out)
    logger.info(f"saved refiner params to {args.out}")

    # ---- held-out recovery eval: scrambled vs refined vertex error ----
    from artiboost_tpu.artiboost.refiner import make_ho_refiner
    from artiboost_tpu.mano.layer import mano_forward

    refine = make_ho_refiner(mano, net, params, n_iters=args.iters)

    def recovery(key_eval):
        k_s, k_c = jax.random.split(key_eval)
        oid = jax.random.randint(k_s, (args.batch,), 0, grasp_lib.n_obj)
        gid = jax.random.randint(jax.random.fold_in(k_s, 1),
                                 (args.batch,), 0, grasp_lib.n_grasp)
        pose, shape, tsl = grasp_lib.gather(oid, gid)
        clean = mano_forward(mano, pose, shape)
        clean_verts = clean.verts + tsl[:, None]
        scram = scrambler(k_c, {
            "hand_pose": pose, "hand_tsl": tsl,
            "joints": clean.joints + tsl[:, None], "hand_verts": clean_verts,
            "hand_transf": clean.transforms_abs})
        sv = mano_forward(mano, scram["hand_pose"], shape).verts \
            + scram["hand_tsl"][:, None]
        e_scram = jnp.mean(jnp.linalg.norm(sv - clean_verts, axis=-1))
        ref = refine({"hand_pose": scram["hand_pose"], "hand_tsl": scram["hand_tsl"],
                      "hand_shape": shape}, obj_verts_all[oid], obj_valid_all[oid])
        e_ref = jnp.mean(jnp.linalg.norm(ref["hand_verts"] - clean_verts, axis=-1))
        return float(e_scram), float(e_ref)

    es, er = zip(*(recovery(jax.random.fold_in(key, 10_000 + i)) for i in range(4)))
    logger.info(
        f"recovery eval: scrambled verts err {1000 * np.mean(es):.2f} mm -> "
        f"refined {1000 * np.mean(er):.2f} mm "
        f"({100 * (1 - np.mean(er) / max(np.mean(es), 1e-9)):.1f}% recovered)")


if __name__ == "__main__":
    main()
