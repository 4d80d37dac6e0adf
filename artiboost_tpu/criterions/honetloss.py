"""MANO parameter/geometry regularizers and object vertex loss
(parity: ``anakin/criterions/honetloss.py``)."""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from artiboost_tpu.criterions.criterion import TensorLoss
from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.utils.batching import key_validity, masked_sample_mean
from artiboost_tpu.utils.registry import LOSS


def _masked_mse_3d(pred: jnp.ndarray, targ: jnp.ndarray, m) -> jnp.ndarray:
    """MSE over (B, N, 3) with an optional (B,) union-batch validity mask;
    masked samples contribute zero and drop out of the denominator."""
    per_sample = jnp.mean((pred - targ) ** 2, axis=(1, 2))
    return masked_sample_mean(per_sample, m)


@LOSS.register_module
class ManoLoss(TensorLoss):
    def __init__(self, **cfg):
        super().__init__()
        self.lambda_joints_3d = float(cfg.get("LAMBDA_JOINTS_3D", 0.0))
        self.lambda_hand_verts_3d = float(cfg.get("LAMBDA_HAND_VERTS_3D", 0.0))
        self.lambda_shape_reg = float(cfg.get("LAMBDA_SHAPE_REG", 0.0))
        self.lambda_pose_reg = float(cfg.get("LAMBDA_POSE_REG", 0.0))

    def __call__(self, preds: Dict, targs: Dict, key=None) -> Tuple[jnp.ndarray, Dict]:
        final_loss, losses = jnp.zeros((), jnp.float32), {}
        if self.lambda_shape_reg:
            shape_reg_loss = jnp.mean(preds["mano_shape"] ** 2)
            final_loss = final_loss + self.lambda_shape_reg * shape_reg_loss
            losses["mano_shape"] = shape_reg_loss
        if self.lambda_pose_reg:
            pose_reg_loss = jnp.mean(preds["mano_pca_pose"][:, 3:] ** 2)
            final_loss = final_loss + self.lambda_pose_reg * pose_reg_loss
            losses["mano_pca_pose"] = pose_reg_loss
        root = targs[Queries.ROOT_JOINT][:, None]
        if self.lambda_joints_3d and Queries.JOINTS_3D in targs:
            joints_3d_loss = _masked_mse_3d(
                preds["joints_3d_abs"], targs[Queries.JOINTS_3D] + root,
                key_validity(targs, Queries.JOINTS_3D, Queries.ROOT_JOINT))
            final_loss = final_loss + self.lambda_joints_3d * joints_3d_loss
            losses["joints_3d_loss"] = joints_3d_loss
        if self.lambda_hand_verts_3d and Queries.HAND_VERTS_3D in targs:
            hand_verts_3d_loss = _masked_mse_3d(
                preds["hand_verts_3d_abs"], targs[Queries.HAND_VERTS_3D] + root,
                key_validity(targs, Queries.HAND_VERTS_3D, Queries.ROOT_JOINT))
            final_loss = final_loss + self.lambda_hand_verts_3d * hand_verts_3d_loss
            losses["hand_verts_3d_loss"] = hand_verts_3d_loss
        losses[self.output_key] = final_loss
        return final_loss, losses


@LOSS.register_module
class ObjLoss(TensorLoss):
    def __init__(self, **cfg):
        super().__init__()
        self.lambda_obj_verts_3d = float(cfg.get("LAMBDA_OBJ_VERTS_3D", 0.0))

    def __call__(self, preds: Dict, targs: Dict, key=None) -> Tuple[jnp.ndarray, Dict]:
        final_loss, losses = jnp.zeros((), jnp.float32), {}
        if self.lambda_obj_verts_3d and Queries.OBJ_VERTS_3D in targs:
            root = targs[Queries.ROOT_JOINT][:, None]
            targ = targs[Queries.OBJ_VERTS_3D] + root
            if "obj_verts_3d_abs" in preds:
                pred = preds["obj_verts_3d_abs"]
            else:
                # reconstruct from predicted box pose over canonical verts
                can = targs[Queries.OBJ_VERTS_CAN]
                pred = (
                    jnp.einsum("bij,bnj->bni", preds["box_rot_rotmat"], can)
                    + preds["boxroot_3d_abs"].reshape(-1, 1, 3)
                )
            mask = targs.get(Queries.PADDING_MASK)
            m = key_validity(targs, Queries.OBJ_VERTS_3D, Queries.OBJ_VERTS_CAN,
                             Queries.ROOT_JOINT)
            if mask is None and m is not None:
                mask = jnp.broadcast_to(m[:, None], pred.shape[:2])
            elif mask is not None and m is not None:
                mask = mask * m[:, None]
            if mask is not None:
                diff = ((pred - targ) ** 2) * mask[..., None]
                obj_verts_3d_loss = jnp.sum(diff) / (jnp.sum(mask) * 3.0 + 1e-8)
            else:
                obj_verts_3d_loss = jnp.mean((pred - targ) ** 2)
            final_loss = final_loss + self.lambda_obj_verts_3d * obj_verts_3d_loss
            losses["obj_verts_3d_loss"] = obj_verts_3d_loss
        losses[self.output_key] = final_loss
        return final_loss, losses
