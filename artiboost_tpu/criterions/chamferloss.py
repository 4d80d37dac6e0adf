"""Bidirectional chamfer loss between predicted-rotated and GT object
vertices (parity: ``anakin/criterions/chamferloss.py:12-52``), using the
TPU matmul-based NN op instead of the CUDA extension."""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from artiboost_tpu.criterions.criterion import TensorLoss
from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.ops.chamfer import chamfer_distance
from artiboost_tpu.utils.batching import key_validity
from artiboost_tpu.utils.registry import LOSS


@LOSS.register_module
class ChamferLoss(TensorLoss):
    def __init__(self, **cfg):
        super().__init__()
        self.lambda_chamfer = float(cfg.get("LAMBDA_CHAMFER", 0.0))

    def __call__(self, preds: Dict, targs: Dict, key=None) -> Tuple[jnp.ndarray, Dict]:
        final_loss, losses = jnp.zeros((), jnp.float32), {}
        if self.lambda_chamfer:
            obj_verts_can = targs[Queries.OBJ_VERTS_CAN]
            pred_obj_verts_abs = (
                jnp.einsum("bij,bnj->bni", preds["box_rot_rotmat"], obj_verts_can)
                + preds["boxroot_3d_abs"].reshape(-1, 1, 3)
            )
            targ_obj_verts_abs = targs[Queries.OBJ_VERTS_3D] + targs[Queries.ROOT_JOINT][:, None]

            sample_vis = jnp.any(targs[Queries.CORNERS_VIS] > 0, axis=1).astype(jnp.float32)
            m = key_validity(targs, Queries.OBJ_VERTS_3D, Queries.OBJ_VERTS_CAN,
                             Queries.ROOT_JOINT)
            if m is not None:  # union-batch samples without obj-vert annot.
                sample_vis = sample_vis * m
            pred_obj_verts_abs = pred_obj_verts_abs * sample_vis[:, None, None]
            targ_obj_verts_abs = targ_obj_verts_abs * sample_vis[:, None, None]

            pad = targs.get(Queries.PADDING_MASK)
            dist_xy, dist_yx = chamfer_distance(
                pred_obj_verts_abs, targ_obj_verts_abs, mask_x=pad, mask_y=pad
            )
            chamfer_loss = jnp.mean(dist_xy) + jnp.mean(dist_yx)
            final_loss = final_loss + self.lambda_chamfer * chamfer_loss
            losses["chamfer_loss"] = chamfer_loss
        losses[self.output_key] = final_loss
        return final_loss, losses
