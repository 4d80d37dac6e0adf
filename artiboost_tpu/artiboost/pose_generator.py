"""Pose generator: sampled (obj, view, grasp) triplets -> camera-space
hand/object poses, fully batched in one jitted pipeline.

Parity: ``anakin/artiboost/preprocessor.py`` (PreProcessorPoseGenerator)
— MANO FK of the grasp, rotation of hand+object into the sampled view
(including the MANO rotation-center-compensated translation update,
:55-60), camera offset placing the grasp midpoint at z_offset, scrambler
perturbation, refiner restoration, and re-application of the in-plane
camera-free transform.

The reference streams this through a torch DataLoader + GPU module and
pickles results to /dev/shm; here it is one pure function over arrays —
the pose cache is simply its (compact) output kept on device.
"""
from __future__ import annotations

from typing import Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp

from artiboost_tpu.artiboost.grasp_library import GraspLibrary
from artiboost_tpu.artiboost.object_library import ObjectLibrary
from artiboost_tpu.artiboost.view_engine import ViewEngineConfig, sample_view
from artiboost_tpu.mano.layer import mano_forward, rotation_center
from artiboost_tpu.mano.model import ManoModel
from artiboost_tpu.utils.transform import aa_to_rotmat, rotmat_to_aa, rt_to_transf


class GeneratedPoses(NamedTuple):
    """Compact pose cache (the /dev/shm pickle equivalent, on device)."""

    obj_id: jnp.ndarray       # (N,) int32
    persp_id: jnp.ndarray     # (N,)
    grasp_id: jnp.ndarray     # (N,)
    obj_pose: jnp.ndarray     # (N, 4, 4) camera-space object pose
    hand_pose: jnp.ndarray    # (N, 48) refined pose (pre camera-free)
    hand_shape: jnp.ndarray   # (N, 10)
    hand_tsl: jnp.ndarray     # (N, 3)
    cam_offset: jnp.ndarray   # (N, 3) camera-system offset
    cam_free: jnp.ndarray     # (N, 3, 3) in-plane roll to re-apply


def decode_final_hand(
    mano_model: ManoModel, gen: GeneratedPoses, idx: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """Re-create final hand verts/joints for a slice of the pose cache
    (render/train time). Applies cam_offset then cam_free, matching
    preprocessor.py:83-88."""
    pose = gen.hand_pose[idx]
    shape = gen.hand_shape[idx]
    tsl = gen.hand_tsl[idx]
    off = gen.cam_offset[idx]
    rotf = gen.cam_free[idx]
    out = mano_forward(mano_model, pose, shape)
    verts = out.verts + tsl[:, None] + off[:, None]
    joints = out.joints + tsl[:, None] + off[:, None]
    verts = jnp.einsum("bij,bnj->bni", rotf, verts)
    joints = jnp.einsum("bij,bnj->bni", rotf, joints)
    return {"hand_verts": verts, "joints": joints}


def rotate_hand_global(
    mano_model: ManoModel,
    rot: jnp.ndarray,        # (B, 3, 3) global rotation about the origin
    hand_pose: jnp.ndarray,  # (B, 48)
    hand_shape: jnp.ndarray, # (B, 10)
    hand_tsl: jnp.ndarray,   # (B, 3)
):
    """Re-express a MANO pose under a global rotation about the origin:
    FK(pose', shape) + tsl' == rot @ (FK(pose, shape) + tsl).

    MANO rotates about its rotation center, not the origin, so the
    translation needs the center-compensation update
    (``preprocessor.py:55-60``). Returns (pose', tsl')."""
    glob = rotmat_to_aa(jnp.einsum("bij,bjk->bik", rot, aa_to_rotmat(hand_pose[:, :3])))
    new_pose = jnp.concatenate([glob, hand_pose[:, 3:]], axis=1)
    center = rotation_center(mano_model, hand_shape)  # (B, 3)
    root_rot = aa_to_rotmat(hand_pose[:, :3])
    offset_0 = center - jnp.einsum("bij,bj->bi", root_rot, center)
    new_root_rot = aa_to_rotmat(new_pose[:, :3])
    offset_1 = center - jnp.einsum("bij,bj->bi", new_root_rot, center)
    new_tsl = jnp.einsum("bij,bj->bi", rot, offset_0 + hand_tsl) - offset_1
    return new_pose, new_tsl


def make_pose_generator(
    mano_model: ManoModel,
    obj_lib: ObjectLibrary,
    grasp_lib: GraspLibrary,
    view_cfg: ViewEngineConfig,
    scrambler: Callable,
    refiner: Callable,
    use_refiner_objs: bool = True,
) -> Callable:
    """-> generate(key, oid, vid, gid) -> GeneratedPoses (all (B,) ids)."""

    def generate(key: jax.Array, oid: jnp.ndarray, vid: jnp.ndarray,
                 gid: jnp.ndarray) -> GeneratedPoses:
        B = oid.shape[0]
        k_view, k_scram = jax.random.split(key)

        # ---- decode grasp (grasp_engine + FK; preprocessor :25-29) ----
        hand_pose, hand_shape, hand_tsl = grasp_lib.gather(oid, gid)
        mano_out = mano_forward(mano_model, hand_pose, hand_shape)
        joints = mano_out.joints + hand_tsl[:, None]

        # ---- view decode (preprocessor :32-40) ----
        persp, cam_free, z_offset = sample_view(view_cfg, vid, k_view)
        persp_inv = persp.transpose(0, 2, 1)

        # camera offset: midpoint of object center (origin) and middle MCP
        op_offset = jnp.einsum("bij,bj->bi", persp_inv, joints[:, 9]) / 2.0
        cam_offset = z_offset - op_offset  # (B, 3)
        obj_pose = rt_to_transf(persp_inv, cam_offset)
        obj_pose = jnp.einsum(
            "bij,bjk->bik",
            rt_to_transf(cam_free, jnp.zeros((B, 3))),
            obj_pose,
        )

        # ---- rotate hand into the view (preprocessor :47-63) ----
        new_hand_pose, new_hand_tsl = rotate_hand_global(
            mano_model, persp_inv, hand_pose, hand_shape, hand_tsl)

        new_out = mano_forward(mano_model, new_hand_pose, hand_shape)
        new_joints = new_out.joints + new_hand_tsl[:, None]
        new_verts = new_out.verts + new_hand_tsl[:, None]

        # ---- scramble (preprocessor :66-73) ----
        scram = scrambler(k_scram, {
            "hand_pose": new_hand_pose,
            "hand_tsl": new_hand_tsl,
            "joints": new_joints,
            "hand_verts": new_verts,
            "hand_transf": new_out.transforms_abs,
        })

        # ---- refine (preprocessor :76-81) ----
        obj_rot = obj_pose[:, :3, :3]
        if use_refiner_objs:
            overts = obj_lib.verts[oid]  # (B, V_MAX, 3)
            ovalid = obj_lib.vert_valid[oid]
            # object points in the pre-camera-offset frame: rotate only
            overts_rot = jnp.einsum("bij,bnj->bni", persp_inv, overts)
            refined = refiner(
                {"hand_pose": scram["hand_pose"], "hand_tsl": scram["hand_tsl"],
                 "hand_shape": hand_shape},
                overts_rot, ovalid,
            )
        else:
            refined = refiner(
                {"hand_pose": scram["hand_pose"], "hand_tsl": scram["hand_tsl"],
                 "hand_shape": hand_shape})

        return GeneratedPoses(
            obj_id=oid.astype(jnp.int32),
            persp_id=vid.astype(jnp.int32),
            grasp_id=gid.astype(jnp.int32),
            obj_pose=obj_pose,
            hand_pose=refined["hand_pose"],
            hand_shape=hand_shape,
            hand_tsl=refined["hand_tsl"],
            cam_offset=cam_offset,
            cam_free=cam_free,
        )

    return generate
