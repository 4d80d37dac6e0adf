"""Ordinal depth-relation losses (parity: ``anakin/criterions/ordinal.py``).

JLOL (joint-level ordinal loss) from the ArtiBoost paper: for pairs of
keypoints (or bone-part cross products) projected onto the camera ray
plus N random virtual view vectors, penalize predicted orderings whose
sign disagrees with ground truth via ``log(1 + relu(-sign * pred))``.

TPU-first notes: the random 1/3 pair subsample and the virtual-view
sampling both consume an explicit PRNG key and use fixed-size gathers,
so the whole loss stays inside one jitted graph.
"""
from __future__ import annotations

from itertools import combinations, product
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from artiboost_tpu.criterions.criterion import TensorLoss
from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.utils.batching import key_validity
from artiboost_tpu.utils.misc import CONST
from artiboost_tpu.utils.registry import LOSS


def sample_view_vectors(key: jax.Array, n_virtual_views: int = 20) -> jnp.ndarray:
    """(NVIEWS+1, 3): camera ray + uniformly sampled upper-hemisphere rays."""
    cam_vec = jnp.asarray([[0.0, 0.0, 1.0]])
    k1, k2 = jax.random.split(key)
    theta = jax.random.uniform(k1, (n_virtual_views,)) * 2.0 * jnp.pi
    u = jax.random.uniform(k2, (n_virtual_views,))
    s = jnp.sqrt(jnp.maximum(1.0 - u * u, 0.0))
    nv = jnp.stack([s * jnp.cos(theta), s * jnp.sin(theta), u], axis=1)
    return jnp.concatenate([cam_vec, nv], axis=0)


def jointlevel_ordinal_relation(jpair: jnp.ndarray, view_vecs: jnp.ndarray) -> jnp.ndarray:
    """jpair (B, P, 6), view_vecs (B, V, 3) -> (B, P, V) signed depth order."""
    diff = jpair[..., :3] - jpair[..., 3:]  # (B, P, 3)
    return jnp.einsum("bpk,bvk->bpv", diff, view_vecs)


def partlevel_ordinal_relation(ppair: jnp.ndarray, view_vecs: jnp.ndarray) -> jnp.ndarray:
    """ppair (B, P, 6) bone-vector pairs -> (B, P, V) via cross-product dot."""
    cross = jnp.cross(ppair[..., :3], ppair[..., 3:])  # (B, P, 3)
    return jnp.einsum("bpk,bvk->bpv", cross, view_vecs)


def _subsample_pairs(key: jax.Array, n_pairs: int, frac: int = 3) -> jnp.ndarray:
    """Random n_pairs//frac pair indices (static output size)."""
    return jax.random.permutation(key, n_pairs)[: max(n_pairs // frac, 1)]


def _mask_kp(kp: jnp.ndarray, vis: jnp.ndarray) -> jnp.ndarray:
    return kp * vis[..., None]


@LOSS.register_module
class HandOrdLoss(TensorLoss):
    def __init__(self, **cfg):
        super().__init__()
        self.lambda_part_lev = float(cfg.get("LAMBDA_PART_LEVEL", 1.0))
        self.lambda_joint_lev = float(cfg.get("LAMBDA_JOINTS_LEVEL", 1.0))
        self.n_virtual_views = int(cfg.get("N_VIRTUAL_VIEWS", 20))
        njoints = CONST.NUM_JOINTS
        self.joint_pairs_idx = jnp.asarray(
            np.array(list(combinations(range(njoints), 2)))
        )  # (210, 2)
        self.parts_pairs_idx = jnp.asarray(
            np.array(list(combinations(range(njoints - 1), 2)))
        )  # (190, 2)
        self.parents = jnp.asarray(np.array(CONST.JOINTS_IDX_PARENTS))

    def _joint_pairs(self, joints: jnp.ndarray) -> jnp.ndarray:
        p = self.joint_pairs_idx
        return jnp.concatenate([joints[:, p[:, 0]], joints[:, p[:, 1]]], axis=2)

    def _part_pairs(self, joints: jnp.ndarray) -> jnp.ndarray:
        parts = (joints - joints[:, self.parents])[:, 1:]  # (B, 20, 3)
        p = self.parts_pairs_idx
        return jnp.concatenate([parts[:, p[:, 0]], parts[:, p[:, 1]]], axis=2)

    def __call__(self, preds: Dict, targs: Dict, key=None) -> Tuple[jnp.ndarray, Dict]:
        if key is None:
            key = jax.random.PRNGKey(0)
        k_view, k_j, k_p = jax.random.split(key, 3)
        B = preds["joints_3d_abs"].shape[0]

        vis = targs[Queries.JOINTS_VIS]
        m = key_validity(targs, Queries.JOINTS_3D, Queries.ROOT_JOINT)
        if m is not None:  # union-batch: zeroed joints give targ_sign 0 -> 0 loss
            vis = vis * m[:, None]
        pred_j = _mask_kp(preds["joints_3d_abs"], vis)
        targ_j = _mask_kp(targs[Queries.JOINTS_3D] + targs[Queries.ROOT_JOINT][:, None], vis)

        view_vecs = jnp.broadcast_to(
            sample_view_vectors(k_view, self.n_virtual_views)[None],
            (B, self.n_virtual_views + 1, 3),
        )

        # joint level
        sel_j = _subsample_pairs(k_j, self.joint_pairs_idx.shape[0])
        pred_jp = self._joint_pairs(pred_j)[:, sel_j]
        targ_jp = self._joint_pairs(targ_j)[:, sel_j]
        targ_sign = jnp.sign(jointlevel_ordinal_relation(targ_jp, view_vecs))
        pred_ord = jointlevel_ordinal_relation(pred_jp, view_vecs)
        joint_ord_loss = jnp.mean(jnp.log1p(jax.nn.relu(-targ_sign * pred_ord)))

        # part level (no log in the reference for parts)
        sel_p = _subsample_pairs(k_p, self.parts_pairs_idx.shape[0])
        pred_pp = self._part_pairs(pred_j)[:, sel_p]
        targ_pp = self._part_pairs(targ_j)[:, sel_p]
        targ_psign = jnp.sign(partlevel_ordinal_relation(targ_pp, view_vecs))
        pred_pord = partlevel_ordinal_relation(pred_pp, view_vecs)
        part_ord_loss = jnp.mean(jax.nn.relu(-targ_psign * pred_pord))

        final_loss = self.lambda_joint_lev * joint_ord_loss + self.lambda_part_lev * part_ord_loss
        losses = {
            "joint_ord_loss": joint_ord_loss,
            "part_ord_loss": part_ord_loss,
            self.output_key: final_loss,
        }
        return final_loss, losses


@LOSS.register_module
class SceneOrdLoss(TensorLoss):
    def __init__(self, **cfg):
        super().__init__()
        self.lambda_scene_lev = float(cfg.get("LAMBDA_SCENE_LEVEL", 1.0))
        self.n_virtual_views = int(cfg.get("N_VIRTUAL_VIEWS", 40))
        self.ho_pairs_idx = jnp.asarray(
            np.array(list(product(range(CONST.NUM_JOINTS), range(CONST.NUM_CORNERS))))
        )  # (168, 2)

    def __call__(self, preds: Dict, targs: Dict, key=None) -> Tuple[jnp.ndarray, Dict]:
        if key is None:
            key = jax.random.PRNGKey(0)
        k_view, k_sel = jax.random.split(key)
        B = preds["joints_3d_abs"].shape[0]
        root = targs[Queries.ROOT_JOINT][:, None]

        j_vis = targs[Queries.JOINTS_VIS]
        c_vis = targs[Queries.CORNERS_VIS]
        mj = key_validity(targs, Queries.JOINTS_3D, Queries.ROOT_JOINT)
        mc = key_validity(targs, Queries.CORNERS_3D, Queries.ROOT_JOINT)
        if mj is not None:
            j_vis = j_vis * mj[:, None]
        if mc is not None:
            c_vis = c_vis * mc[:, None]
        pred_j = _mask_kp(preds["joints_3d_abs"], j_vis)
        targ_j = _mask_kp(targs[Queries.JOINTS_3D] + root, j_vis)
        pred_c = _mask_kp(preds["corners_3d_abs"], c_vis)
        targ_c = _mask_kp(targs[Queries.CORNERS_3D] + root, c_vis)

        view_vecs = jnp.broadcast_to(
            sample_view_vectors(k_view, self.n_virtual_views)[None],
            (B, self.n_virtual_views + 1, 3),
        )
        sel = _subsample_pairs(k_sel, self.ho_pairs_idx.shape[0])
        p = self.ho_pairs_idx[sel]

        pred_pairs = jnp.concatenate([pred_j[:, p[:, 0]], pred_c[:, p[:, 1]]], axis=2)
        targ_pairs = jnp.concatenate([targ_j[:, p[:, 0]], targ_c[:, p[:, 1]]], axis=2)
        targ_sign = jnp.sign(jointlevel_ordinal_relation(targ_pairs, view_vecs))
        pred_ord = jointlevel_ordinal_relation(pred_pairs, view_vecs)
        scene_ord_loss = jnp.mean(jnp.log1p(jax.nn.relu(-targ_sign * pred_ord)))

        final_loss = self.lambda_scene_lev * scene_ord_loss
        return final_loss, {"scene_ord_loss": scene_ord_loss, self.output_key: final_loss}
