"""MANO forward kinematics (LBS) in pure JAX.

TPU-first rewrite of the MANO layer: all-batch einsum LBS, FK over the
static kinematic tree unrolled per-level (5 parallel finger chains — the
same level trick the reference's JAX seed uses,
``anakin/postprocess/iknet/manolayer.py:215-250``, but expressed as
batched einsums), fully differentiable and vmappable.

Outputs match what the reference pipeline consumes from manotorch
(``anakin/artiboost/preprocessor.py:25-29,62-63``): ``verts``,
``joints`` (21, reordered), ``transforms_abs`` (16, 4, 4),
``full_poses`` (48,), plus ``center_joint`` handling.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from artiboost_tpu.mano.model import (
    JOINT_REORDER,
    KINTREE_PARENTS,
    ManoModel,
    NUM_JOINTS,
    TIP_VERT_IDS,
)
from artiboost_tpu.utils.transform import aa_to_rotmat, rotmat_to_aa

# FK levels: wrist, then the 5 MCP joints, then PIP, then DIP — each level
# only depends on the previous, so each is one batched (B, 5, 4, 4) matmul.
_LEV1 = (1, 4, 7, 10, 13)
_LEV2 = (2, 5, 8, 11, 14)
_LEV3 = (3, 6, 9, 12, 15)


class ManoOutput(NamedTuple):
    verts: jnp.ndarray           # (B, 778, 3)
    joints: jnp.ndarray          # (B, 21, 3) conventional ordering
    transforms_abs: jnp.ndarray  # (B, 16, 4, 4) MANO-native joint order
    full_poses: jnp.ndarray      # (B, 48) axis-angle incl. global rot


def _with_zeros_row(rt: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 4) -> (..., 4, 4)."""
    pad = jnp.zeros(rt.shape[:-2] + (1, 4), rt.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([rt, pad], axis=-2)


def pca_to_axisang(model: ManoModel, pose_coeffs: jnp.ndarray, ncomps: int,
                   flat_hand_mean: bool = True) -> jnp.ndarray:
    """(B, 3+ncomps) PCA pose -> (B, 48) full axis-angle pose."""
    glob = pose_coeffs[:, :3]
    coeffs = pose_coeffs[:, 3:3 + ncomps]
    hand = coeffs @ model.hands_components[:ncomps]
    if not flat_hand_mean:
        hand = hand + model.hands_mean
    return jnp.concatenate([glob, hand], axis=1)


@partial(jax.jit, static_argnames=("center_idx",))
def mano_forward(
    model: ManoModel,
    full_pose: jnp.ndarray,      # (B, 48) axis-angle
    betas: jnp.ndarray,          # (B, 10)
    center_idx: Optional[int] = None,
) -> ManoOutput:
    # geometry demands f32 matmuls; TPU's default bf16 contraction loses
    # ~5e-4 m of vertex accuracy which is visible in mm-scale metrics
    with jax.default_matmul_precision("float32"):
        B = full_pose.shape[0]
        rots = aa_to_rotmat(full_pose.reshape(B, 16, 3))
        return _mano_forward_impl(model, rots, full_pose, center_idx=center_idx,
                                  betas=betas)


@partial(jax.jit, static_argnames=("center_idx",))
def mano_forward_rotmat(
    model: ManoModel,
    rots: jnp.ndarray,           # (B, 16, 3, 3) per-joint rotations
    betas: jnp.ndarray,          # (B, 10)
    center_idx: Optional[int] = None,
) -> ManoOutput:
    """FK straight from rotation matrices. The gradient-safe entry point
    for optimization loops over 6D/rotmat pose parameterizations:
    ``rotmat_to_aa``'s backward is singular at angle 0/pi, so converting
    to axis-angle just to re-convert inside FK would poison training
    (the RefineNet trainer hit exactly this). ``full_poses`` is still
    reported for downstream consumers, gradient-stopped."""
    with jax.default_matmul_precision("float32"):
        aa = jax.lax.stop_gradient(rotmat_to_aa(rots)).reshape(rots.shape[0], 48)
        return _mano_forward_impl(model, rots, aa, center_idx=center_idx,
                                  betas=betas)


def _mano_forward_impl(model, rots, full_pose, *, betas, center_idx) -> ManoOutput:
    B = rots.shape[0]

    # pose blendshapes use rotations minus identity for the 15 finger joints
    pose_feature = (rots[:, 1:] - jnp.eye(3, dtype=rots.dtype)).reshape(B, 135)

    v_shaped = model.v_template[None] + jnp.einsum(
        "vds,bs->bvd", model.shapedirs, betas
    )  # (B, 778, 3)
    j_rest = jnp.einsum("jv,bvd->bjd", model.J_regressor, v_shaped)  # (B, 16, 3)
    v_posed = v_shaped + jnp.einsum("vdp,bp->bvd", model.posedirs, pose_feature)

    # ---- FK over levels ----
    root_tf = _with_zeros_row(
        jnp.concatenate([rots[:, 0], j_rest[:, 0, :, None]], axis=-1)
    )  # (B, 4, 4)

    def _level(parent_tf, jids, parent_jids):
        """parent_tf (B, 5, 4, 4) -> child abs transforms (B, 5, 4, 4)."""
        jids = list(jids)
        rel_t = j_rest[:, jids] - j_rest[:, parent_jids]  # (B, 5, 3)
        rel = _with_zeros_row(
            jnp.concatenate([rots[:, jids], rel_t[..., None]], axis=-1)
        )  # (B, 5, 4, 4)
        return jnp.einsum("bfij,bfjk->bfik", parent_tf, rel)

    lev0 = jnp.broadcast_to(root_tf[:, None], (B, 5, 4, 4))
    lev1 = _level(lev0, _LEV1, [0] * 5)
    lev2 = _level(lev1, _LEV2, list(_LEV1))
    lev3 = _level(lev2, _LEV3, list(_LEV2))

    # scatter back to MANO-native joint order
    transforms_abs = jnp.zeros((B, NUM_JOINTS, 4, 4), dtype=full_pose.dtype)
    transforms_abs = transforms_abs.at[:, 0].set(root_tf)
    transforms_abs = transforms_abs.at[:, list(_LEV1)].set(lev1)
    transforms_abs = transforms_abs.at[:, list(_LEV2)].set(lev2)
    transforms_abs = transforms_abs.at[:, list(_LEV3)].set(lev3)

    # ---- LBS ----
    # remove the rest-pose joint location so transforms act about each joint
    j_h = jnp.concatenate([j_rest, jnp.zeros((B, NUM_JOINTS, 1), full_pose.dtype)], -1)
    skinning_tf = transforms_abs.at[..., :4, 3].add(
        -jnp.einsum("bjik,bjk->bji", transforms_abs, j_h)
    )

    # T = sum_j w_vj * A_j  -> apply to rest verts (one einsum, MXU-friendly)
    v_h = jnp.concatenate([v_posed, jnp.ones((B, v_posed.shape[1], 1), full_pose.dtype)], -1)
    verts = jnp.einsum("vj,bjik,bvk->bvi", model.lbs_weights, skinning_tf, v_h)[..., :3]

    joints16 = transforms_abs[:, :, :3, 3]
    tips = verts[:, list(TIP_VERT_IDS)]
    joints21 = jnp.concatenate([joints16, tips], axis=1)[:, list(JOINT_REORDER)]

    if center_idx is not None:
        center = joints21[:, center_idx:center_idx + 1]
        verts = verts - center
        joints21 = joints21 - center

    return ManoOutput(verts=verts, joints=joints21,
                      transforms_abs=transforms_abs, full_poses=full_pose)


def rotation_center(model: ManoModel, betas: jnp.ndarray) -> jnp.ndarray:
    """Point the global rotation pivots about: the shaped root joint.

    Parity: manotorch ``ManoLayer.get_rotation_center`` used at
    ``anakin/artiboost/preprocessor.py:55``.
    """
    v_shaped = model.v_template[None] + jnp.einsum("vds,bs->bvd", model.shapedirs, betas)
    return jnp.einsum("v,bvd->bd", model.J_regressor[0], v_shaped)


class ManoLayer:
    """Thin stateful wrapper bundling a ManoModel with pose-mode config.

    Mirrors the constructor knobs of the reference layer (pca/axisang,
    ncomps, flat_hand_mean, center_idx) while keeping all compute in the
    pure functions above.
    """

    def __init__(
        self,
        model: ManoModel,
        use_pca: bool = False,
        ncomps: int = 45,
        flat_hand_mean: bool = True,
        center_idx: Optional[int] = None,
    ):
        self.model = model
        self.use_pca = use_pca
        self.ncomps = ncomps if use_pca else 45
        self.flat_hand_mean = flat_hand_mean
        self.center_idx = center_idx

    def __call__(self, pose: jnp.ndarray, betas: jnp.ndarray) -> ManoOutput:
        if self.use_pca:
            full_pose = pca_to_axisang(self.model, pose, self.ncomps, self.flat_hand_mean)
        else:
            full_pose = pose
            if not self.flat_hand_mean:
                full_pose = full_pose.at[:, 3:].add(self.model.hands_mean)
        return mano_forward(self.model, full_pose, betas, center_idx=self.center_idx)

    def get_rotation_center(self, betas: jnp.ndarray) -> jnp.ndarray:
        return rotation_center(self.model, betas)

    @property
    def faces(self):
        return self.model.faces
