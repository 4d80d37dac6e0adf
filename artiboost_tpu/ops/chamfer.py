"""Nearest-neighbor / chamfer distance as MXU matmuls.

Replaces the reference's CUDA ``chamfer_distance`` extension
(``anakin/artiboost/refiner.py:21-83``, ``criterions/chamferloss.py:17``)
with the TPU-native formulation: squared pairwise distances expand to
``|x|^2 + |y|^2 - 2 x.y^T`` whose cross term is one batched matmul, so
the 778 x 10k NN search in the grasp refiner rides the systolic array
instead of a scalar kernel. Masked points are excluded via +inf.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def pairwise_sqdist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """x (B, N, 3), y (B, M, 3) -> (B, N, M) squared euclidean distances."""
    x2 = jnp.sum(x * x, axis=-1)  # (B, N)
    y2 = jnp.sum(y * y, axis=-1)  # (B, M)
    cross = jnp.einsum("bnd,bmd->bnm", x, y)  # MXU
    d = x2[:, :, None] + y2[:, None, :] - 2.0 * cross
    return jnp.maximum(d, 0.0)


@partial(jax.jit, static_argnames=("return_idx",))
def chamfer_distance(
    x: jnp.ndarray,
    y: jnp.ndarray,
    mask_x: Optional[jnp.ndarray] = None,
    mask_y: Optional[jnp.ndarray] = None,
    return_idx: bool = False,
):
    """Bidirectional squared NN distances.

    Returns (dist_xy (B, N), dist_yx (B, M)[, idx_xy, idx_yx]) matching
    the CUDA extension's convention (squared distances).
    mask_* : (B, N)/(B, M) 1 = valid. Invalid points get dist 0 and are
    never selected as neighbors.
    """
    d = pairwise_sqdist(x, y)  # (B, N, M)
    big = jnp.asarray(jnp.finfo(d.dtype).max, d.dtype)
    if mask_y is not None:
        d = jnp.where(mask_y[:, None, :] > 0, d, big)
    if mask_x is not None:
        d_t = jnp.where(mask_x[:, :, None] > 0, d, big)
    else:
        d_t = d

    dist_xy = jnp.min(d, axis=2)
    dist_yx = jnp.min(d_t, axis=1)
    if mask_x is not None:
        dist_xy = jnp.where(mask_x > 0, dist_xy, 0.0)
    if mask_y is not None:
        dist_yx = jnp.where(mask_y > 0, dist_yx, 0.0)
    if not return_idx:
        return dist_xy, dist_yx
    idx_xy = jnp.argmin(d, axis=2)
    idx_yx = jnp.argmin(d_t, axis=1)
    return dist_xy, dist_yx, idx_xy, idx_yx


def signed_hand_object_distance(
    hand_verts: jnp.ndarray,   # (B, 778, 3)
    obj_verts: jnp.ndarray,    # (B, M, 3)
    obj_normals: jnp.ndarray,  # (B, M, 3)
) -> jnp.ndarray:
    """Signed distance from each hand vertex to the object surface:
    negative inside (penetration). Parity with the refiner's use of
    chamfer + normal dot test (``anakin/artiboost/refiner.py:45-83``)."""
    d = pairwise_sqdist(hand_verts, obj_verts)  # (B, N, M)
    idx = jnp.argmin(d, axis=2)  # (B, N)
    nn_dist = jnp.sqrt(jnp.take_along_axis(d, idx[..., None], axis=2)[..., 0])
    nn_pts = jnp.take_along_axis(obj_verts, idx[..., None], axis=1)
    nn_nrm = jnp.take_along_axis(obj_normals, idx[..., None], axis=1)
    inside = jnp.sum((hand_verts - nn_pts) * nn_nrm, axis=-1) < 0
    return jnp.where(inside, -nn_dist, nn_dist)
