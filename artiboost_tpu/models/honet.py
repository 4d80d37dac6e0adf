"""HoNet — Hasson CVPR'20-style hand+object net (parity:
``anakin/models/honetMANO.py:20-286``): ManoBranch hand + pixel-space
scale/trans heads lifted to camera space via focal-scale reasoning
(``recover_3d_proj``), plus an object trans/rot head relative to hand.
"""
from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.models.hpregnet import ManoBranch, TransHead
from artiboost_tpu.models.resnet import ResNet
from artiboost_tpu.utils.registry import MODEL, build_backbone, build_head
from artiboost_tpu.utils.transform import aa_to_rotmat, batch_persp_proj2d


def recover_3d_proj(
    objpoints3d: jnp.ndarray,  # (B, N, 3) centered
    camintr: jnp.ndarray,      # (B, 3, 3)
    est_scale: jnp.ndarray,    # (B, 1)
    est_trans: jnp.ndarray,    # (B, 2)
    input_res: Tuple[int, int],
    off_z: float = 0.4,
):
    """Lift centered points to camera space from predicted pixel-space
    scale/trans (reference honetMANO.py:113-139)."""
    focal = camintr[:, 0:1, 0]  # (B, 1)
    est_Z0 = focal * est_scale + off_z  # (B, 1)
    cam_centers = camintr[:, :2, 2]
    img_centers = jnp.asarray(input_res, dtype=objpoints3d.dtype) / 2.0
    est_XY0 = (est_trans + img_centers - cam_centers) * est_Z0 / focal
    est_c3d = jnp.concatenate([est_XY0, est_Z0], axis=-1)[:, None]  # (B, 1, 3)
    return est_c3d + objpoints3d, est_c3d


class HoNet(nn.Module):
    backbone: ResNet
    mano_branch: ManoBranch
    obj_trans_factor: float = 100.0
    obj_scale_factor: float = 0.0001
    inp_res: Tuple[int, int] = (224, 224)
    center_idx: int = 9
    # FHB joint-convention adaptor (reference honetMANO.py:44-53): a
    # frozen 778->21 linear regressor replacing the MANO joints
    adaptor: Optional["ManoAdaptor"] = None

    @nn.compact
    def __call__(self, inputs: Dict[str, jnp.ndarray], train: bool = False) -> Dict[str, jnp.ndarray]:
        image = inputs[Queries.IMAGE]
        height, width = image.shape[1], image.shape[2]
        feats = self.backbone(image, train=train)
        feature = feats["res_layer4_mean"]
        cam_intr = inputs[Queries.CAM_INTR]

        mano_results = self.mano_branch(feature)
        if self.adaptor is not None:
            # FHB skeleton convention (honetMANO.py:144-155): regress
            # joints from the MANO verts, recenter both at center_idx
            adapt_joints = self.adaptor(mano_results["hand_verts_3d"])
            center = adapt_joints[:, self.center_idx][:, None]
            mano_results = dict(
                mano_results,
                joints_3d=adapt_joints - center,
                hand_verts_3d=mano_results["hand_verts_3d"] - center,
            )

        # hand absolute position from pixel-space scale/trans
        scaletrans = TransHead(out_dim=3, name="mano_transhead")(feature)
        trans = scaletrans[:, 1:]
        scale = scaletrans[:, 0:1]
        final_trans = trans * self.obj_trans_factor
        final_scale = scale * self.obj_scale_factor
        joints_3d_abs, root_joint = recover_3d_proj(
            mano_results["joints_3d"], cam_intr, final_scale, final_trans, (width, height)
        )
        hand_verts_3d_abs = mano_results["hand_verts_3d"] + root_joint

        # object: 6-dim head = scale (1) + pixel trans (2) + AXIS-ANGLE
        # rotation (3), rodrigues'd to a rotmat (reference
        # honetMANO.py:192-198 — NOT a 6D rotation head)
        scaletrans_obj = TransHead(out_dim=6, name="obj_transhead")(feature)
        obj_scale = scaletrans_obj[:, 0:1] * self.obj_scale_factor
        obj_trans = scaletrans_obj[:, 1:3] * self.obj_trans_factor
        rotaxisang = scaletrans_obj[:, 3:6]
        rotmat = aa_to_rotmat(rotaxisang)
        corners_can = inputs[Queries.CORNERS_CAN]
        obj_corners = jnp.einsum("bij,bnj->bni", rotmat, corners_can)
        corners_3d_abs, obj_center = recover_3d_proj(
            obj_corners, cam_intr, obj_scale, obj_trans, (width, height)
        )

        out = {}
        if Queries.OBJ_VERTS_CAN in inputs:
            # reference honetMANO.py:200-236: canonical obj verts ride the
            # same rot + recovered center
            overts = jnp.einsum("bij,bnj->bni", rotmat,
                                inputs[Queries.OBJ_VERTS_CAN])
            obj_verts_3d_abs = overts + obj_center
            out.update({
                "obj_verts_3d_abs": obj_verts_3d_abs,
                "obj_verts_3d": obj_verts_3d_abs - root_joint,
                "obj_verts_2d": batch_persp_proj2d(obj_verts_3d_abs, cam_intr),
            })

        return {
            **out,
            "joints_3d_abs": joints_3d_abs,
            "joints_3d": mano_results["joints_3d"],
            "hand_verts_3d_abs": hand_verts_3d_abs,
            "hand_verts_3d": mano_results["hand_verts_3d"],
            "joints_2d": batch_persp_proj2d(joints_3d_abs, cam_intr),
            "hand_verts_2d": batch_persp_proj2d(hand_verts_3d_abs, cam_intr),
            "corners_3d_abs": corners_3d_abs,
            # root-relative to the HAND root (honetMANO.py:250)
            "corners_3d": corners_3d_abs - root_joint,
            "corners_2d": batch_persp_proj2d(corners_3d_abs, cam_intr),
            "box_rot_rotmat": rotmat,
            "boxroot_3d_abs": obj_center,
            "root_joint": root_joint[:, 0],
            "mano_shape": mano_results["mano_shape"],
            "mano_pca_pose": mano_results["mano_pca_pose"],
        }


@MODEL.register_module(name="HoNet")
def build_honet(**cfg):
    import os

    data_preset = cfg.get("DATA_PRESET", {})
    sub = {"DTYPE": cfg["DTYPE"]} if cfg.get("DTYPE") else {}
    adaptor = None
    if cfg.get("MANO_FHB_ADAPTOR", False):
        from artiboost_tpu.mano.model import get_mano_model
        from artiboost_tpu.models.hpregnet import ManoAdaptor

        center_idx = data_preset.get("CENTER_IDX", 9)
        load_path = os.path.join(
            cfg.get("MANO_FHB_ADAPTOR_DIR", "assets/hasson20_assets/mano"),
            f"fhb_skel_centeridx{center_idx}.pkl")
        adaptor = ManoAdaptor(
            mano_model=get_mano_model(cfg["HEAD"].get("MANO_ASSETS_ROOT")),
            load_path=load_path)
    return HoNet(
        backbone=build_backbone({**sub, **cfg["BACKBONE"]}, default_args=data_preset),
        mano_branch=build_head(cfg["HEAD"], default_args=data_preset),
        obj_trans_factor=cfg.get("OBJ_TRANS_FACTOR", 100.0),
        obj_scale_factor=cfg.get("OBJ_SCALE_FACTOR", 0.0001),
        inp_res=tuple(data_preset.get("IMAGE_SIZE", (224, 224))),
        center_idx=data_preset.get("CENTER_IDX", 9),
        adaptor=adaptor,
    )
