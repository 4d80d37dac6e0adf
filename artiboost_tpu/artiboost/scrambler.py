"""Pose scramblers — perturbation of sampled grasps, batched in JAX.

Parity: ``anakin/artiboost/scrambler.py``:
  * ``naive``   — translation noise only (:38-54)
  * ``random``  — axis-angle magnitude noise on all 16 joints (:57-81)
  * ``random_2``— anatomically-aware: per-finger splay about the up axis
    at the MCPs and interlinked bend about the left axis with
    coefficients [1.0, 1.1, 0.9] (:84-189)
  * ``random_3``— simplified all-joint bend (:192-260)

All consume an explicit PRNG key and operate on full batches.
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from artiboost_tpu.mano.axis_layer import hand_axes
from artiboost_tpu.utils.transform import aa_to_rotmat, rotmat_to_aa

SCRAMBLER_REGISTRY: Dict[str, Callable] = {}


def register_scrambler(name):
    def deco(fn):
        SCRAMBLER_REGISTRY[name] = fn
        return fn
    return deco


def build_scrambler(cfg: Dict) -> Callable:
    """cfg: {"TYPE": ..., "HAND_TSL_SIGMA": ..., "HAND_POSE_SIGMA": ...}
    -> fn(key, feed) -> {"hand_pose", "hand_tsl"}."""
    kind = cfg["TYPE"]
    tsl_sigma = float(cfg.get("HAND_TSL_SIGMA", 0.01))
    pose_sigma = float(cfg.get("HAND_POSE_SIGMA", 0.1))
    fn = SCRAMBLER_REGISTRY[kind]

    def scramble(key, feed):
        return fn(key, feed, tsl_sigma, pose_sigma)

    return scramble


def axis_angle_op(aa_1: jnp.ndarray, aa_2: jnp.ndarray) -> jnp.ndarray:
    """Compose two (B, J, 3) axis-angle rotations: R(aa_1) @ R(aa_2)."""
    r = aa_to_rotmat(aa_1) @ aa_to_rotmat(aa_2)
    return rotmat_to_aa(r)


@register_scrambler("naive")
def naive_scrambler(key, feed, tsl_sigma, pose_sigma):
    B = feed["hand_pose"].shape[0]
    noise = jax.random.normal(key, (B, 3)) * tsl_sigma
    return {"hand_pose": feed["hand_pose"], "hand_tsl": feed["hand_tsl"] + noise}


@register_scrambler("random")
def random_scrambler(key, feed, tsl_sigma, pose_sigma):
    k1, k2 = jax.random.split(key)
    pose = feed["hand_pose"]
    B = pose.shape[0]
    tsl_noise = jax.random.normal(k1, (B, 3)) * tsl_sigma
    ang_noise = jax.random.normal(k2, (B, 16)) * pose_sigma
    aa = pose.reshape(B, 16, 3)
    norm = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    axis = aa / jnp.maximum(norm, 1e-7)
    angle = norm[..., 0] + ang_noise  # may go negative (flips axis) — parity
    aa = axis * angle[..., None]
    return {"hand_pose": aa.reshape(B, 48), "hand_tsl": feed["hand_tsl"] + tsl_noise}


# finger layout (MANO-native articulated joints 1..15):
# index (1,2,3)  middle (4,5,6)  pinky (7,8,9)  ring (10,11,12)  thumb (13,14,15)
# axis-layer rows 0..14 correspond to joints 1..15
_INTERLINK = (1.0, 1.1, 0.9)


@register_scrambler("random_2")
def random_scrambler_2(key, feed, tsl_sigma, pose_sigma):
    keys = jax.random.split(key, 4)
    pose = feed["hand_pose"]
    B = pose.shape[0]
    b_ax, u_ax, l_ax = hand_axes(feed["joints"], feed["hand_transf"])

    hand_pose = pose.reshape(B, 16, 3)
    tsl_noise = jax.random.normal(keys[0], (B, 3)) * tsl_sigma

    # splay the 4 finger MCPs (axis rows 0, 3, 6, 9 -> joints 1, 4, 7, 10)
    splay_rows = jnp.asarray([0, 3, 6, 9])
    splay_joints = jnp.asarray([1, 4, 7, 10])
    splay_angle = jax.random.normal(keys[1], (B, 4)) * pose_sigma
    splay_aa = u_ax[:, splay_rows] * splay_angle[..., None]
    hand_pose = hand_pose.at[:, splay_joints].set(
        axis_angle_op(hand_pose[:, splay_joints], splay_aa)
    )

    # interlinked bend per finger about the left axis
    bend_angle = jax.random.normal(keys[2], (B, 5)) * pose_sigma  # per finger
    interlink = jnp.asarray(_INTERLINK)
    finger_rows = [(0, 1, 2), (3, 4, 5), (9, 10, 11), (6, 7, 8)]  # idx mid ring pinky
    finger_joints = [(1, 2, 3), (4, 5, 6), (10, 11, 12), (7, 8, 9)]
    for fi, (rows, joints) in enumerate(zip(finger_rows, finger_joints)):
        ang = bend_angle[:, fi:fi + 1] * interlink  # (B, 3)
        aa = l_ax[:, jnp.asarray(rows)] * ang[..., None]
        j = jnp.asarray(joints)
        hand_pose = hand_pose.at[:, j].set(axis_angle_op(aa, hand_pose[:, j]))
    # thumb: joints 14, 15 about rows 13, 14 with interlink (1.0, 0.9)
    ang = bend_angle[:, 4:5] * jnp.asarray([_INTERLINK[0], _INTERLINK[2]])
    aa = l_ax[:, jnp.asarray([13, 14])] * ang[..., None]
    j = jnp.asarray([14, 15])
    hand_pose = hand_pose.at[:, j].set(axis_angle_op(aa, hand_pose[:, j]))

    # thumb CMC (joint 13, axis row 12): bend + splay
    other = jax.random.normal(keys[3], (B, 2)) * pose_sigma
    bend_aa = l_ax[:, 12:13] * other[:, 0:1, None]
    splay_aa = u_ax[:, 12:13] * other[:, 1:2, None]
    cur = hand_pose[:, 13:14]
    hand_pose = hand_pose.at[:, 13:14].set(
        axis_angle_op(splay_aa, axis_angle_op(bend_aa, cur))
    )

    return {"hand_pose": hand_pose.reshape(B, 48),
            "hand_tsl": feed["hand_tsl"] + tsl_noise}


@register_scrambler("random_3")
def random_scrambler_3(key, feed, tsl_sigma, pose_sigma):
    keys = jax.random.split(key, 4)
    pose = feed["hand_pose"]
    B = pose.shape[0]
    b_ax, u_ax, l_ax = hand_axes(feed["joints"], feed["hand_transf"])
    hand_pose = pose.reshape(B, 16, 3)
    tsl_noise = jax.random.normal(keys[0], (B, 3)) * tsl_sigma

    splay_rows = jnp.asarray([0, 3, 6, 9])
    splay_joints = jnp.asarray([1, 4, 7, 10])
    splay_angle = jax.random.normal(keys[1], (B, 4)) * pose_sigma
    splay_aa = u_ax[:, splay_rows] * splay_angle[..., None]
    hand_pose = hand_pose.at[:, splay_joints].set(
        axis_angle_op(hand_pose[:, splay_joints], splay_aa)
    )

    bend_rows = jnp.asarray([0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14])
    bend_joints = jnp.asarray([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 15])
    bend_angle = jax.random.normal(keys[2], (B, 14)) * pose_sigma
    bend_aa = l_ax[:, bend_rows] * bend_angle[..., None]
    hand_pose = hand_pose.at[:, bend_joints].set(
        axis_angle_op(bend_aa, hand_pose[:, bend_joints])
    )

    other = jax.random.normal(keys[3], (B, 2)) * pose_sigma
    bend_aa = l_ax[:, 12:13] * other[:, 0:1, None]
    splay_aa = u_ax[:, 12:13] * other[:, 1:2, None]
    cur = hand_pose[:, 13:14]
    hand_pose = hand_pose.at[:, 13:14].set(
        axis_angle_op(splay_aa, axis_angle_op(bend_aa, cur))
    )
    return {"hand_pose": hand_pose.reshape(B, 48),
            "hand_tsl": feed["hand_tsl"] + tsl_noise}
