#!/usr/bin/env python
"""Train IKNet natively (replaces the released torch iknet checkpoint).

The reference loads pretrained iknet weights for mesh-fitting
initialization (``anakin/postprocess/iknet/checkpoints.py``,
``fittingunit.py:112-140``) and never trains them. This script trains our
flax IKNet on synthetic MANO FK data: random poses -> FK joints
(normalized exactly as FittingUnit normalizes) -> supervised per-joint
quaternions + FK joint reconstruction.

Usage:
    python script/train_iknet.py --steps 4000 --out assets/iknet_tpu.npz
FittingUnit picks assets/iknet_tpu.npz up automatically when present.
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from artiboost_tpu.mano.layer import mano_forward
from artiboost_tpu.mano.model import get_mano_model
from artiboost_tpu.postprocess.fitting import (FittingUnit,
                                               make_iknet_train_step,
                                               save_iknet_params)
from artiboost_tpu.postprocess.iknet import IKNet
from artiboost_tpu.utils.logger import logger


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default="assets/iknet_tpu.npz")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log_freq", type=int, default=250)
    args = ap.parse_args()

    mano = get_mano_model()
    net = IKNet()
    init_fn, step_fn = make_iknet_train_step(mano, net, learning_rate=args.lr)
    variables, opt_state = init_fn(jax.random.PRNGKey(args.seed))

    key = jax.random.PRNGKey(args.seed + 1)
    t0 = time.time()
    for step in range(args.steps):
        key, k = jax.random.split(key)
        variables, opt_state, metrics = step_fn(variables, opt_state, k)
        if step % args.log_freq == 0 or step == args.steps - 1:
            m = {kk: float(v) for kk, v in metrics.items()}
            logger.info(f"step {step:5d}  loss {m['loss']:.5f}  "
                        f"quat {m['l_quat']:.5f}  joints {m['l_joints']:.5f}  "
                        f"({time.time() - t0:.1f}s)")

    save_iknet_params(variables, args.out)
    logger.info(f"saved iknet params to {args.out}")

    # ---- held-out eval: fitting residual with the trained initializer ----
    from artiboost_tpu.postprocess.fitting import load_iknet_params
    fit = FittingUnit(mano, iknet_params=load_iknet_params(args.out))
    rng = np.random.RandomState(123)
    pose = jnp.asarray(rng.randn(64, 48).astype(np.float32) * 0.2)
    out = mano_forward(mano, pose, jnp.zeros((64, 10)))
    joints = out.joints + jnp.asarray([0.0, 0.0, 0.5])
    res = fit(joints)
    err = float(jnp.mean(jnp.linalg.norm(res["joints"] - joints, axis=-1)))
    logger.info(f"fitting residual joint err (trained init): {err * 1000:.2f} mm")


if __name__ == "__main__":
    main()
