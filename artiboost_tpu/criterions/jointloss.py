"""Visibility-masked MSE on joints/corners (parity:
``anakin/criterions/jointloss.py:14-67``)."""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from artiboost_tpu.criterions.criterion import TensorLoss
from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.utils.batching import key_validity
from artiboost_tpu.utils.registry import LOSS


def _masked_mse(pred: jnp.ndarray, targ: jnp.ndarray, vis: jnp.ndarray) -> jnp.ndarray:
    """MSE over all elements after zeroing invisible keypoints — matches
    the reference's einsum-mask-then-mse (mean over B*N*3, not vis-count)."""
    pred = pred * vis[..., None]
    targ = targ * vis[..., None]
    return jnp.mean((pred - targ) ** 2)


def _fold_valid(vis: jnp.ndarray, m) -> jnp.ndarray:
    """AND a (B,) union-batch key-validity mask into a (B, N) vis map.

    Every caller folds ROOT_JOINT validity alongside the primary key:
    abs targets are built as ``targ + root``, so a sample whose root was
    zero-filled by the union concat has a wrong abs target even when the
    primary key is annotated (ADVICE r4)."""
    return vis if m is None else vis * m[:, None]


@LOSS.register_module
class JointsLoss(TensorLoss):
    def __init__(self, **cfg):
        super().__init__()
        self.lambda_joints_3d = float(cfg.get("LAMBDA_JOINTS_3D", 0.0))
        self.lambda_corners_3d = float(cfg.get("LAMBDA_CORNERS_3D", 0.0))

    def __call__(self, preds: Dict, targs: Dict, key=None) -> Tuple[jnp.ndarray, Dict]:
        final_loss, losses = jnp.zeros((), jnp.float32), {}
        root = targs[Queries.ROOT_JOINT][:, None]
        if self.lambda_joints_3d:
            joints_3d_loss = _masked_mse(
                preds["joints_3d_abs"],
                targs[Queries.JOINTS_3D] + root,
                _fold_valid(targs[Queries.JOINTS_VIS],
                            key_validity(targs, Queries.JOINTS_3D,
                                         Queries.ROOT_JOINT)),
            )
            final_loss = final_loss + self.lambda_joints_3d * joints_3d_loss
            losses["joints_3d_loss"] = joints_3d_loss
        if self.lambda_corners_3d:
            corners_3d_loss = _masked_mse(
                preds["corners_3d_abs"],
                targs[Queries.CORNERS_3D] + root,
                _fold_valid(targs[Queries.CORNERS_VIS],
                            key_validity(targs, Queries.CORNERS_3D,
                                         Queries.ROOT_JOINT)),
            )
            final_loss = final_loss + self.lambda_corners_3d * corners_3d_loss
            losses["corners_3d_loss"] = corners_3d_loss
        losses[self.output_key] = final_loss
        return final_loss, losses


@LOSS.register_module
class HandJointsLoss(TensorLoss):
    def __init__(self, **cfg):
        super().__init__()
        self.lambda_joints_3d = float(cfg.get("LAMBDA_JOINTS_3D", 1.0))

    def __call__(self, preds: Dict, targs: Dict, key=None) -> Tuple[jnp.ndarray, Dict]:
        root = targs[Queries.ROOT_JOINT][:, None]
        joints_3d_loss = _masked_mse(
            preds["joints_3d_abs"],
            targs[Queries.JOINTS_3D] + root,
            _fold_valid(targs[Queries.JOINTS_VIS],
                        key_validity(targs, Queries.JOINTS_3D,
                                     Queries.ROOT_JOINT)),
        )
        final_loss = self.lambda_joints_3d * joints_3d_loss
        return final_loss, {"joints_3d_loss": joints_3d_loss, self.output_key: final_loss}
