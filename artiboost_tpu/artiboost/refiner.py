"""Grasp-validity refiner (GrabNet RefineNet) in flax.

Parity: ``anakin/artiboost/refiner.py`` — ``null`` pass-through
(:118-147) and ``hand_obj`` = iterative RefineNet (:150-285): hand ->
object point distances (the CUDA chamfer ext, here the MXU matmul-argmin
op), ResBlock MLP predicting delta pose (16 x 6D rotation) + delta
translation, re-evaluating contact each of N iterations.

Note on 6D layout: this implementation uses the column-major ortho-6D
convention of ``utils.transform.rot6d_to_rotmat``. GrabNet's released
``refinenet.pt`` is NOT directly importable — this RefineNet is a
re-design (LayerNorm ResBlocks, zero-init delta heads, different widths)
— so ``build_refiner`` loads the natively-trained
``assets/refinenet_tpu.npz`` (``script/train_refiner.py``) instead.
"""
from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from artiboost_tpu.mano.layer import mano_forward, mano_forward_rotmat
from artiboost_tpu.mano.model import ManoModel
from artiboost_tpu.ops.chamfer import chamfer_distance
from artiboost_tpu.utils.logger import logger
from artiboost_tpu.utils.transform import aa_to_rotmat, rot6d_to_rotmat, rotmat_to_aa


class ResBlock(nn.Module):
    fout: int
    n_neurons: int = 256

    @nn.compact
    def __call__(self, x):
        fin = x.shape[-1]
        xin = x if fin == self.fout else nn.leaky_relu(nn.Dense(self.fout)(x), 0.2)
        h = nn.Dense(self.n_neurons)(x)
        h = nn.LayerNorm()(h)  # BN in eval mode ~ fixed affine; LN is the
        h = nn.leaky_relu(h, 0.2)  # jit-friendly stand-in with same role
        h = nn.Dense(self.fout)(h)
        h = nn.LayerNorm()(h)
        return nn.leaky_relu(xin + h, 0.2)


class RefineNet(nn.Module):
    """One refinement step: distances + current pose -> delta pose/tsl."""

    h_size: int = 512

    @nn.compact
    def __call__(self, h2o_dist, pose_6d, trans):
        """h2o_dist (B, 778), pose_6d (B, 96), trans (B, 3)."""
        d = nn.LayerNorm()(h2o_dist)
        x0 = jnp.concatenate([d, pose_6d, trans], axis=1)
        x = ResBlock(self.h_size)(x0)
        x = ResBlock(self.h_size)(jnp.concatenate([x, x0], axis=1))
        x = ResBlock(self.h_size)(jnp.concatenate([x, x0], axis=1))
        # delta heads start at zero so an untrained refiner is the identity
        # (the reference always loads pretrained GrabNet weights; without
        # them random deltas would catapult the hand out of frame)
        dpose = nn.Dense(16 * 6, kernel_init=nn.initializers.zeros)(x)
        dtrans = nn.Dense(3, kernel_init=nn.initializers.zeros)(x)
        return dpose, dtrans


def pose_aa_to_6d(pose_aa: jnp.ndarray) -> jnp.ndarray:
    """(B, 48) -> (B, 96) per-joint ortho-6D."""
    B = pose_aa.shape[0]
    rot = aa_to_rotmat(pose_aa.reshape(B, 16, 3))
    return jnp.concatenate([rot[..., :, 0], rot[..., :, 1]], axis=-1).reshape(B, 96)


def pose_6d_to_aa(pose_6d: jnp.ndarray) -> jnp.ndarray:
    B = pose_6d.shape[0]
    rot = rot6d_to_rotmat(pose_6d.reshape(B, 16, 6))
    return rotmat_to_aa(rot).reshape(B, 48)


def make_null_refiner(mano_model: ManoModel) -> Callable:
    """fn(feed) -> refined dict; FK only (parity NullRefine :118-147)."""

    def refine(feed: Dict, obj_verts=None, obj_valid=None) -> Dict:
        out = mano_forward(mano_model, feed["hand_pose"], feed.get(
            "hand_shape", jnp.zeros((feed["hand_pose"].shape[0], 10))))
        tsl = feed["hand_tsl"]
        return {
            "hand_verts": out.verts + tsl[:, None],
            "joints": out.joints + tsl[:, None],
            "hand_pose": feed["hand_pose"],
            "hand_tsl": tsl,
        }

    return refine


def make_ho_refiner(
    mano_model: ManoModel,
    refine_net: RefineNet,
    params,
    n_iters: int = 3,
) -> Callable:
    """fn(feed, obj_verts, obj_valid) -> refined dict.

    feed: hand_pose (B, 48), hand_tsl (B, 3), hand_shape (B, 10) opt.
    obj_verts: (B, M, 3) object points already rotated into the hand
    frame (parity: HORefiner rotates resampled objs by obj_rot :225).
    """

    def refine(feed: Dict, obj_verts: jnp.ndarray,
               obj_valid: Optional[jnp.ndarray] = None) -> Dict:
        B = feed["hand_pose"].shape[0]
        shape = feed.get("hand_shape", jnp.zeros((B, 10)))
        pose_6d = pose_aa_to_6d(feed["hand_pose"])
        trans = feed["hand_tsl"]

        def h2o(pose_6d_, trans_):
            rots = rot6d_to_rotmat(pose_6d_.reshape(B, 16, 6))
            verts = mano_forward_rotmat(mano_model, rots, shape).verts + trans_[:, None]
            d_xy, _ = chamfer_distance(verts, obj_verts, mask_y=obj_valid)
            return jnp.sqrt(jnp.maximum(d_xy, 1e-12))  # |signed| (ref :226)

        def body(_, carry):
            pose_6d_, trans_ = carry
            dist = h2o(pose_6d_, trans_)
            dpose, dtrans = refine_net.apply(params, dist, pose_6d_, trans_)
            return pose_6d_ + dpose, trans_ + dtrans

        pose_6d, trans = jax.lax.fori_loop(0, n_iters, body, (pose_6d, trans))

        aa = pose_6d_to_aa(pose_6d)
        out = mano_forward(mano_model, aa, shape)
        return {
            "hand_verts": out.verts + trans[:, None],
            "joints": out.joints + trans[:, None],
            "hand_pose": aa,
            "hand_tsl": trans,
        }

    return refine


# --------------------------------------------------------------------------
# Training the refiner (replaces the GrabNet pretrained checkpoint)
# --------------------------------------------------------------------------
#
# The reference downloads ``assets/GrabNet/refinenet.pt`` and never trains
# it (``anakin/artiboost/refiner.py:165``). Our RefineNet is a re-design,
# so the framework provides the GrabNet-style training recipe natively:
# take clean grasps from the grasp library, corrupt them with the same
# scrambler the synthesis pipeline uses, and train the unrolled N-step
# refinement to recover the clean hand (vertex + joint recovery loss),
# under random global rotations so the net generalizes to view frames.


def make_refiner_train_step(
    mano_model: ManoModel,
    refine_net: RefineNet,
    scrambler: Callable,
    n_iters: int = 3,
    learning_rate: float = 1e-4,
    w_verts: float = 1.0,
    w_joints: float = 1.0,
    w_contact: float = 0.5,
):
    """-> (init_fn(key) -> (params, opt_state), step_fn).

    step_fn(params, opt_state, key, hand_pose (B,48), hand_shape (B,10),
    hand_tsl (B,3), obj_verts (B,M,3), obj_valid (B,M))
    -> (params, opt_state, metrics dict).
    """
    import optax

    tx = optax.adam(learning_rate)

    def init_fn(key):
        params = refine_net.init(
            key, jnp.zeros((1, 778)), jnp.zeros((1, 96)), jnp.zeros((1, 3)))
        return params, tx.init(params)

    def _rand_rotmat(key, B):
        axis = jax.random.normal(key, (B, 3))
        axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-8)
        ang = jax.random.uniform(jax.random.fold_in(key, 1), (B, 1),
                                 minval=0.0, maxval=2.0 * jnp.pi)
        return aa_to_rotmat(axis * ang)

    def loss_fn(params, key, hand_pose, hand_shape, hand_tsl, obj_verts, obj_valid):
        from artiboost_tpu.artiboost.pose_generator import rotate_hand_global

        B = hand_pose.shape[0]
        k_rot, k_scram = jax.random.split(key)

        # random global rotation: grasps are stored in the object frame,
        # but the refiner runs in sampled view frames at synthesis time
        rot = _rand_rotmat(k_rot, B)
        hand_pose, hand_tsl = rotate_hand_global(
            mano_model, rot, hand_pose, hand_shape, hand_tsl)
        obj_verts = jnp.einsum("bij,bnj->bni", rot, obj_verts)

        clean = mano_forward(mano_model, hand_pose, hand_shape)
        clean_verts = clean.verts + hand_tsl[:, None]
        clean_joints = clean.joints + hand_tsl[:, None]
        d_clean, _ = chamfer_distance(clean_verts, obj_verts, mask_y=obj_valid)
        d_clean = jnp.sqrt(jnp.maximum(d_clean, 1e-12))

        scram = scrambler(k_scram, {
            "hand_pose": hand_pose, "hand_tsl": hand_tsl,
            "joints": clean_joints, "hand_verts": clean_verts,
            "hand_transf": clean.transforms_abs,
        })
        pose_6d = pose_aa_to_6d(scram["hand_pose"])
        trans = scram["hand_tsl"]

        # unrolled refinement (differentiable; mirrors make_ho_refiner).
        # FK runs straight from rot6d->rotmat: round-tripping through
        # axis-angle would hit rotmat_to_aa's singular backward at
        # identity joint rotations and NaN the gradients
        for _ in range(n_iters):
            rots = rot6d_to_rotmat(pose_6d.reshape(B, 16, 6))
            verts = mano_forward_rotmat(
                mano_model, rots, hand_shape).verts + trans[:, None]
            d_xy, _ = chamfer_distance(verts, obj_verts, mask_y=obj_valid)
            dist = jnp.sqrt(jnp.maximum(d_xy, 1e-12))
            dpose, dtrans = refine_net.apply(params, dist, pose_6d, trans)
            pose_6d = pose_6d + dpose
            trans = trans + dtrans

        rots = rot6d_to_rotmat(pose_6d.reshape(B, 16, 6))
        out = mano_forward_rotmat(mano_model, rots, hand_shape)
        verts = out.verts + trans[:, None]
        joints = out.joints + trans[:, None]
        d_ref, _ = chamfer_distance(verts, obj_verts, mask_y=obj_valid)
        d_ref = jnp.sqrt(jnp.maximum(d_ref, 1e-12))

        l_verts = jnp.mean(jnp.sum((verts - clean_verts) ** 2, axis=-1))
        l_joints = jnp.mean(jnp.sum((joints - clean_joints) ** 2, axis=-1))
        # pull the refined contact profile toward the clean grasp's: this
        # is what makes refinement more than pose denoising (GrabNet's
        # hand-object distance supervision)
        l_contact = jnp.mean((d_ref - d_clean) ** 2)
        loss = w_verts * l_verts + w_joints * l_joints + w_contact * l_contact
        return loss, {"loss": loss, "l_verts": l_verts,
                      "l_joints": l_joints, "l_contact": l_contact}

    @jax.jit
    def step_fn(params, opt_state, key, hand_pose, hand_shape, hand_tsl,
                obj_verts, obj_valid):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, key, hand_pose, hand_shape, hand_tsl, obj_verts, obj_valid)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return init_fn, step_fn


def save_refiner_params(params, path: str) -> None:
    """Flat-npz snapshot of RefineNet params (the native checkpoint
    format; pairs with ``load_refiner_params``)."""
    import numpy as np
    from flax.traverse_util import flatten_dict

    flat = {"/".join(k): np.asarray(v)
            for k, v in flatten_dict(params).items()}
    np.savez(path, **flat)


def load_refiner_params(path: str):
    import numpy as np
    from flax.traverse_util import unflatten_dict

    blob = np.load(path)
    return unflatten_dict({tuple(k.split("/")): jnp.asarray(blob[k])
                           for k in blob.files})


def build_refiner(cfg: Dict, mano_model: ManoModel, key: Optional[jax.Array] = None):
    """cfg: {"TYPE": "null"|"hand_obj", "ITERS": 3, "PRETRAINED": path}.

    PRETRAINED: a ``.npz`` saved by ``save_refiner_params``. The
    reference's GrabNet ``refinenet.pt`` cannot be imported directly —
    this RefineNet is a re-design (LayerNorm ResBlocks, zero-init delta
    heads) — so when the configured checkpoint is absent (or none is
    configured) the natively-trained ``assets/refinenet_tpu.npz`` is
    loaded; with neither, the net starts as the identity refiner (zero
    deltas) and trains jointly."""
    if cfg.get("TYPE", "null") == "null":
        return make_null_refiner(mano_model)
    net = RefineNet()
    if key is None:
        key = jax.random.PRNGKey(0)
    params = net.init(key, jnp.zeros((1, 778)), jnp.zeros((1, 96)), jnp.zeros((1, 3)))
    pretrained = cfg.get("PRETRAINED")
    # natively-trained fallback (script/train_refiner.py) when the
    # configured checkpoint (e.g. the reference's GrabNet .pt) is absent
    from artiboost_tpu.utils.misc import asset_path

    fallback = asset_path("assets/refinenet_tpu.npz")
    if not pretrained and os.path.isfile(fallback):
        logger.info(f"refiner: no PRETRAINED configured; using native {fallback}")
        pretrained = fallback
    if pretrained and not os.path.isfile(str(pretrained)) and os.path.isfile(fallback):
        logger.info(f"refiner: {pretrained} absent; using native {fallback}")
        pretrained = fallback
    if pretrained and str(pretrained).endswith(".npz") and os.path.isfile(pretrained):
        loaded = load_refiner_params(pretrained)
        params = loaded if "params" in loaded else {"params": loaded}
        logger.info(f"refiner: loaded pretrained params from {pretrained}")
    elif pretrained:
        logger.warning(
            f"refiner: {pretrained} not loadable (need a .npz from "
            "save_refiner_params); starting from the identity refiner")
    return make_ho_refiner(mano_model, net, params, n_iters=int(cfg.get("ITERS", 3)))
