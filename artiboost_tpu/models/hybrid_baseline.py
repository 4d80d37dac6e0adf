"""HybridBaseline: heatmap (soft-argmax) joints + 6D-rotation box head.

Parity: ``anakin/models/hybridbaseline.py:18-103`` — the released
"Clas"-style ArtiBoost model. ResNet backbone, IntegralDeconvHead over
22 classes (21 joints + box root), an MLP predicting the object's 6D
rotation from pooled features; corners are reconstructed as
``R @ corners_can + boxroot_abs`` and reprojected for the 2D output.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.models.integral_head import IntegralDeconvHead
from artiboost_tpu.models.mlp import MLP
from artiboost_tpu.models.resnet import ResNet
from artiboost_tpu.utils.misc import CONST
from artiboost_tpu.utils.registry import MODEL, build_backbone, build_head, build_model
from artiboost_tpu.utils.transform import batch_uvd2xyz, rot6d_to_rotmat


class HybridBaseline(nn.Module):
    backbone: ResNet
    hybrid_head: IntegralDeconvHead
    box_head: MLP
    inp_res: Tuple[int, int] = (224, 224)
    center_idx: int = 9

    @nn.compact
    def __call__(self, inputs: Dict[str, jnp.ndarray], train: bool = False) -> Dict[str, jnp.ndarray]:
        image = inputs[Queries.IMAGE]  # (B, H, W, 3)
        height, width = image.shape[1], image.shape[2]
        feats = self.backbone(image, train=train)
        pose_results = self.hybrid_head(feats["res_layer4"], train=train)
        box_rot_6d = self.box_head(feats["res_layer4_mean"])

        pose_3d_abs = batch_uvd2xyz(
            uvd=pose_results["kp3d"],
            root_joint=inputs[Queries.ROOT_JOINT],
            intr=inputs[Queries.CAM_INTR],
            inp_res=self.inp_res,
        )  # (B, 22, 3)
        joints_3d_abs = pose_3d_abs[:, 0:CONST.NUM_JOINTS]
        boxroot_3d_abs = pose_3d_abs[:, CONST.NUM_JOINTS:CONST.NUM_JOINTS + 1]
        corners_can = inputs[Queries.CORNERS_CAN]  # (B, 8, 3)
        box_rot_rotmat = rot6d_to_rotmat(box_rot_6d)
        corners_3d_abs = jnp.einsum("bij,bnj->bni", box_rot_rotmat, corners_can) + boxroot_3d_abs

        root_joint = joints_3d_abs[:, self.center_idx]

        cam_intr = inputs[Queries.CAM_INTR]
        hom = jnp.einsum("bij,bnj->bni", cam_intr, corners_3d_abs)
        corners_2d = hom[..., :2] / jnp.maximum(hom[..., 2:], 1e-8)
        corners_2d = corners_2d / jnp.asarray([width, height], dtype=corners_2d.dtype)
        corners_2d_uvd = jnp.concatenate(
            [corners_2d, jnp.zeros_like(corners_2d[..., :1])], axis=-1
        )
        final_2d_uvd = jnp.concatenate(
            [pose_results["kp3d"][:, 0:21], corners_2d_uvd, pose_results["kp3d"][:, 21:22]], axis=1
        )

        return {
            "joints_3d_abs": joints_3d_abs,
            "corners_3d_abs": corners_3d_abs,
            "joints_3d": joints_3d_abs - root_joint[:, None],
            "corners_3d": corners_3d_abs - root_joint[:, None],
            "2d_uvd": final_2d_uvd,
            "boxroot_3d_abs": boxroot_3d_abs,
            "box_rot_rotmat": box_rot_rotmat,
            "joints_confd": pose_results["kp3d_confd"][:, :21],
        }


@MODEL.register_module(name="HybridBaseline")
def build_hybrid_baseline(**cfg):
    data_preset = cfg.get("DATA_PRESET", {})
    # ARCH-level DTYPE ("bfloat16" for MXU-rate inference/training;
    # params stay f32, geometry/softmax stay f32) cascades to submodules
    sub = {}
    if cfg.get("DTYPE"):
        sub["DTYPE"] = cfg["DTYPE"]
    backbone = build_backbone({**sub, **cfg["BACKBONE"]}, default_args=data_preset)
    head = build_head({**sub, **cfg["HYBRID_HEAD"]}, default_args=data_preset)
    box_head = build_model({**sub, **cfg["BOX_HEAD"]}, default_args=data_preset)
    return HybridBaseline(
        backbone=backbone,
        hybrid_head=head,
        box_head=box_head,
        inp_res=tuple(data_preset.get("IMAGE_SIZE", (224, 224))),
        center_idx=data_preset.get("CENTER_IDX", 9),
    )
