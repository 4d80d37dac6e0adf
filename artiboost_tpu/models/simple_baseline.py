"""SimpleBaseline: pure heatmap model over 29 keypoints (21 joints + 8
corners). Parity: ``anakin/models/simplebaseline.py:194-241``."""
from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.models.integral_head import IntegralDeconvHead
from artiboost_tpu.models.resnet import ResNet
from artiboost_tpu.utils.misc import CONST
from artiboost_tpu.utils.registry import MODEL, build_backbone, build_head
from artiboost_tpu.utils.transform import batch_uvd2xyz


class SimpleBaseline(nn.Module):
    backbone: ResNet
    pose_head: IntegralDeconvHead
    inp_res: Tuple[int, int] = (224, 224)
    center_idx: int = 9

    @nn.compact
    def __call__(self, inputs: Dict[str, jnp.ndarray], train: bool = False) -> Dict[str, jnp.ndarray]:
        feats = self.backbone(inputs[Queries.IMAGE], train=train)
        pose_results = self.pose_head(feats["res_layer4"], train=train)
        kp3d_abs = batch_uvd2xyz(
            uvd=pose_results["kp3d"],
            root_joint=inputs[Queries.ROOT_JOINT],
            intr=inputs[Queries.CAM_INTR],
            inp_res=self.inp_res,
        )
        joints_3d_abs = kp3d_abs[:, :CONST.NUM_JOINTS]
        corners_3d_abs = kp3d_abs[:, CONST.NUM_JOINTS:]
        root_joint = joints_3d_abs[:, self.center_idx]
        return {
            "joints_3d_abs": joints_3d_abs,
            "corners_3d_abs": corners_3d_abs,
            "joints_3d": joints_3d_abs - root_joint[:, None],
            "corners_3d": corners_3d_abs - root_joint[:, None],
            "2d_uvd": pose_results["kp3d"],
            "joints_confd": pose_results["kp3d_confd"][:, :CONST.NUM_JOINTS],
            "corners_confd": pose_results["kp3d_confd"][:, CONST.NUM_JOINTS:],
        }


@MODEL.register_module(name="SimpleBaseline")
def build_simple_baseline(**cfg):
    data_preset = cfg.get("DATA_PRESET", {})
    sub = {"DTYPE": cfg["DTYPE"]} if cfg.get("DTYPE") else {}
    return SimpleBaseline(
        backbone=build_backbone({**sub, **cfg["BACKBONE"]}, default_args=data_preset),
        pose_head=build_head({**sub, **cfg["HEAD"]}, default_args=data_preset),
        inp_res=tuple(data_preset.get("IMAGE_SIZE", (224, 224))),
        center_idx=data_preset.get("CENTER_IDX", 9),
    )
