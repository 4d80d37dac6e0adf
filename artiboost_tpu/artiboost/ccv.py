"""CCV (Configuration x View x Grasp) space: dense weight / occurrence /
blacklist maps and triplet sampling — all device arrays.

Parity: ``anakin/artiboost/artiboost_loader.py:125-127`` (maps),
``ovg_set.py:104-178`` (sampling + flat-id math + occurrence), and the
one-time blacklist sweep (``artiboost_loader.py:415-500``). The
reference loops the 57.6k-triplet sweep on CPU; here it is one
vectorized expression over the full space.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from artiboost_tpu.mano.model import ManoModel
from artiboost_tpu.utils.transform import aa_to_rotmat


class CCVSpace(NamedTuple):
    sample_weight_map: jnp.ndarray  # (O, V, G) f32
    occurrence_map: jnp.ndarray     # (O, V, G) i32
    blacklist_map: jnp.ndarray      # (O, V, G) f32, 1 = blacklisted

    @property
    def shape(self) -> Tuple[int, int, int]:
        return self.sample_weight_map.shape

    def effective_weights(self) -> jnp.ndarray:
        return self.sample_weight_map * (1.0 - self.blacklist_map)


def init_ccv_space(n_obj: int, n_persp: int, n_grasp: int,
                   blacklist_map=None) -> CCVSpace:
    shape = (n_obj, n_persp, n_grasp)
    if blacklist_map is None:
        blacklist_map = jnp.zeros(shape, jnp.float32)
    return CCVSpace(
        sample_weight_map=jnp.ones(shape, jnp.float32),
        occurrence_map=jnp.zeros(shape, jnp.int32),
        blacklist_map=blacklist_map,
    )


def flat_to_ovg(flat_id: jnp.ndarray, n_persp: int, n_grasp: int):
    """flat id -> (obj, persp, grasp) (parity: ovg_set.py:161-170)."""
    obj_id = flat_id // (n_persp * n_grasp)
    rem = flat_id % (n_persp * n_grasp)
    return obj_id, rem // n_grasp, rem % n_grasp


def ovg_to_flat(oid, vid, gid, n_persp: int, n_grasp: int):
    return (oid * n_persp + vid) * n_grasp + gid


@partial(jax.jit, static_argnames=("n_samples", "replace"))
def sample_triplets(
    space: CCVSpace, key: jax.Array, n_samples: int, replace: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Weight-guided triplet draw.

    Train mode samples WITH replacement from Categorical(weights)
    (ovg_set.py:113); val mode (replace=False) approximates multinomial
    without replacement via Gumbel top-k. Returns (oid, vid, gid,
    new_occurrence_map).
    """
    O, V, G = space.shape
    w = space.effective_weights().reshape(-1)
    logw = jnp.log(jnp.maximum(w, 1e-20))
    if replace:
        flat = jax.random.categorical(key, logw, shape=(n_samples,))
    else:
        g = jax.random.gumbel(key, logw.shape)
        flat = jax.lax.top_k(logw + g, n_samples)[1]
    oid, vid, gid = flat_to_ovg(flat, V, G)
    occ = space.occurrence_map.at[oid, vid, gid].add(1)
    return oid, vid, gid, occ


def build_blacklist_map(
    mano_model: ManoModel,
    grasp_poses: jnp.ndarray,      # (O, G, 48)
    persp_rotmats: jnp.ndarray,    # (V, 3, 3) bin centers
    threshold: float = -0.8,
) -> jnp.ndarray:
    """Hand-back-view filter, whole CCV space at once.

    A triplet is blacklisted when the camera would look at the back of
    the hand: back_arrow = persp^T . R_wrist . back_dir with back_dir =
    the reference's normalized [1.0, 0.2, 0.0] (artiboost_loader.py:482
    — mostly +x with a slight +y tilt in the MANO canonical frame);
    blacklist if dot(back_arrow, z) < threshold.
    Parity: artiboost_loader.py:466-495.
    """
    wrist_rot = aa_to_rotmat(grasp_poses[..., :3])            # (O, G, 3, 3)
    back_dir = jnp.asarray([1.0, 0.2, 0.0])
    back_dir = back_dir / jnp.linalg.norm(back_dir)
    back_world = jnp.einsum("ogij,j->ogi", wrist_rot, back_dir)  # (O, G, 3)
    arrow = jnp.einsum("vji,ogj->ovgi", persp_rotmats, back_world)  # persp^T .
    dot_z = arrow[..., 2]  # (O, V, G)
    return (dot_z < threshold).astype(jnp.float32)
