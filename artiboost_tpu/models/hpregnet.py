"""HOPRegNet — MANO-parameter regression model (the reference "Reg"
model, ``anakin/models/hpregnet.py:19-183``): ResNet18 features ->
ManoBranch (PCA pose + shape -> MANO FK) for the hand, plus a 9-dim
TransHead (tsl-wrt-hand 3 + rot6d) for the object.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.mano.layer import mano_forward, mano_forward_rotmat, pca_to_axisang
from artiboost_tpu.mano.model import ManoModel
from artiboost_tpu.models.resnet import ResNet
from artiboost_tpu.utils.registry import HEAD, MODEL, build_backbone, build_head
from artiboost_tpu.utils.transform import batch_persp_proj2d, rot6d_to_rotmat, rotmat_proj


class TransHead(nn.Module):
    """inp_dim -> inp_dim/2 -> out_dim MLP (reference hpregnet.py:53)."""

    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inp_dim = x.shape[-1]
        x = nn.relu(nn.Dense(inp_dim // 2, dtype=self.dtype)(x))
        return nn.Dense(self.out_dim, dtype=self.dtype)(x).astype(jnp.float32)


class ManoBranch(nn.Module):
    """MLP -> MANO PCA pose + shape -> FK (reference mano.py:45-133)."""

    mano_model: ManoModel
    ncomps: int = 15
    use_pca: bool = True
    use_shape: bool = True
    center_idx: int = 9
    flat_hand_mean: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        x = feature.astype(self.dtype)
        x = nn.relu(nn.Dense(512, dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(512, dtype=self.dtype)(x))
        pose_size = (self.ncomps + 3) if self.use_pca else 16 * 9
        pose = nn.Dense(pose_size, dtype=self.dtype)(x).astype(jnp.float32)
        shape = (
            nn.Dense(10, dtype=self.dtype)(x).astype(jnp.float32)
            if self.use_shape else jnp.zeros((feature.shape[0], 10), jnp.float32)
        )
        if self.use_pca:
            full_pose = pca_to_axisang(self.mano_model, pose, self.ncomps, self.flat_hand_mean)
            mano_out = mano_forward(self.mano_model, full_pose, shape,
                                    center_idx=self.center_idx)
        else:
            # rotmat mode (reference mano.py:75, manotorch use_pca=False):
            # 16x9 raw outputs, SVD-projected onto SO(3), FK from rotmats
            # (grad-safe: no axis-angle round-trip in the training path)
            rots = rotmat_proj(pose.reshape(-1, 16, 3, 3))
            mano_out = mano_forward_rotmat(self.mano_model, rots, shape,
                                           center_idx=self.center_idx)
        return {
            "hand_verts_3d": mano_out.verts,
            "joints_3d": mano_out.joints,
            "mano_shape": shape,
            "mano_pca_pose": pose,
            "mano_full_pose": mano_out.full_poses,
        }


class ManoAdaptor(nn.Module):
    """Fixed linear 778-vert -> 21-joint regressor (reference
    ``anakin/models/mano.py:13-41``): maps MANO vertices to a dataset's
    joint convention (e.g. FHB). Initialized from the released FHB
    adaptor pickle when ``load_path`` exists (``exp_data["adaptor"]``),
    else from the MANO skinning regressor extended with fingertip vertex
    picks; frozen (stop_gradient, as the reference sets
    requires_grad=False)."""

    mano_model: ManoModel
    load_path: str = ""

    @nn.compact
    def __call__(self, verts: jnp.ndarray) -> jnp.ndarray:
        from artiboost_tpu.mano.model import JOINT_REORDER, TIP_VERT_IDS

        def init_regressor(_key, shape):
            if self.load_path and os.path.isfile(self.load_path):
                import pickle

                with open(self.load_path, "rb") as f:
                    reg = jnp.asarray(pickle.load(f)["adaptor"], jnp.float32)
                assert reg.shape == shape, (reg.shape, shape)
                return reg
            reg16 = jnp.asarray(self.mano_model.J_regressor)  # (16, 778)
            tips = jnp.zeros((5, reg16.shape[1]), reg16.dtype)
            for row, vid in enumerate(TIP_VERT_IDS):
                tips = tips.at[row, vid].set(1.0)
            reg21 = jnp.concatenate([reg16, tips], axis=0)[jnp.asarray(JOINT_REORDER)]
            assert reg21.shape == shape
            return reg21

        reg = self.param("regressor", init_regressor, (21, verts.shape[1]))
        return jnp.einsum("jv,bvc->bjc", jax.lax.stop_gradient(reg), verts)


class HOPRegNet(nn.Module):
    backbone: ResNet
    mano_branch: ManoBranch
    inp_res: Tuple[int, int] = (224, 224)
    center_idx: int = 9

    @nn.compact
    def __call__(self, inputs: Dict[str, jnp.ndarray], train: bool = False) -> Dict[str, jnp.ndarray]:
        feats = self.backbone(inputs[Queries.IMAGE], train=train)
        feature = feats["res_layer4_mean"]
        cam_intr = inputs[Queries.CAM_INTR]
        root_joint = inputs[Queries.ROOT_JOINT]

        # hand branch (reference recover_mano, hpregnet.py:106)
        mano_results = self.mano_branch(feature)
        joints_3d_abs = mano_results["joints_3d"] + root_joint[:, None]
        hand_verts_3d_abs = mano_results["hand_verts_3d"] + root_joint[:, None]

        # object branch (reference recover_object, hpregnet.py:139)
        transf_obj = TransHead(out_dim=9, name="obj_transfhead")(feature)
        tsl_wrt_hand = transf_obj[:, :3]
        box_rot_6d = transf_obj[:, 3:]
        rotmat = rot6d_to_rotmat(box_rot_6d)
        obj_center = root_joint + tsl_wrt_hand
        corners_can = inputs[Queries.CORNERS_CAN]
        corners_3d_abs = jnp.einsum("bij,bnj->bni", rotmat, corners_can) + obj_center[:, None]

        return {
            "joints_3d_abs": joints_3d_abs,
            "joints_3d": mano_results["joints_3d"],
            "hand_verts_3d_abs": hand_verts_3d_abs,
            "hand_verts_3d": mano_results["hand_verts_3d"],
            "joints_2d": batch_persp_proj2d(joints_3d_abs, cam_intr),
            "corners_3d_abs": corners_3d_abs,
            "corners_3d": corners_3d_abs - root_joint[:, None],
            "corners_2d": batch_persp_proj2d(corners_3d_abs, cam_intr),
            "obj_center": obj_center,
            "obj_pred_tsl": tsl_wrt_hand,
            "obj_pred_rot": rotmat,
            "box_rot_rotmat": rotmat,
            "boxroot_3d_abs": obj_center[:, None],
            "mano_shape": mano_results["mano_shape"],
            "mano_pca_pose": mano_results["mano_pca_pose"],
            "mano_full_pose": mano_results["mano_full_pose"],
        }


@HEAD.register_module(name="ManoAdaptor")
def build_mano_adaptor(**cfg):
    from artiboost_tpu.mano.model import get_mano_model

    return ManoAdaptor(mano_model=get_mano_model(cfg.get("MANO_ASSETS_ROOT")),
                       load_path=cfg.get("LOAD_PATH", ""))


@HEAD.register_module(name="ManoBranch")
def build_mano_branch(**cfg):
    from artiboost_tpu.mano.model import get_mano_model

    return ManoBranch(
        mano_model=get_mano_model(cfg.get("MANO_ASSETS_ROOT")),
        ncomps=cfg.get("NCOMPS", 15),
        use_pca=cfg.get("USE_PCA", True),
        use_shape=cfg.get("USE_SHAPE", True),
        center_idx=cfg.get("CENTER_IDX", 9),
    )


@MODEL.register_module(name="HOPRegNet")
def build_hopregnet(**cfg):
    data_preset = cfg.get("DATA_PRESET", {})
    sub = {"DTYPE": cfg["DTYPE"]} if cfg.get("DTYPE") else {}
    return HOPRegNet(
        backbone=build_backbone({**sub, **cfg["BACKBONE"]}, default_args=data_preset),
        mano_branch=build_head(cfg["HEAD"], default_args=data_preset),
        inp_res=tuple(data_preset.get("IMAGE_SIZE", (224, 224))),
        center_idx=data_preset.get("CENTER_IDX", 9),
    )
