"""MANO model parameters as a JAX pytree.

Loads the official MANO pickle when available (``MANO_RIGHT.pkl``; same
asset the reference consumes through manotorch), and otherwise provides
a deterministic *synthetic* hand model with identical shapes/topology so
the full pipeline is testable and benchmarkable without the licensed
asset. Reference FK semantics: ``anakin/postprocess/iknet/manolayer.py``.
"""
from __future__ import annotations

import os
import pickle
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

NUM_VERTS = 778
NUM_JOINTS = 16  # articulated joints in the kinematic tree (incl. wrist)
NUM_SHAPE = 10
NUM_POSE_COMPS = 45  # 15 joints x 3 aa

# child-vertex used as each fingertip, appended after the 16 FK joints
# (reference manolayer.py:264: verts[:, [745, 317, 444, 556, 673]])
TIP_VERT_IDS = (745, 317, 444, 556, 673)  # thumb, index, middle, ring, pinky

# FK joint parents in MANO-native order:
# 0 wrist; 1-3 index; 4-6 middle; 7-9 pinky; 10-12 ring; 13-15 thumb
KINTREE_PARENTS = (-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14)

# MANO-native (16 joints + 5 tips) -> conventional 21-kp order
# (reference manolayer.py:268)
JOINT_REORDER = (0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11, 12, 19, 7, 8, 9, 20)


class ManoModel(NamedTuple):
    """All arrays float32 unless noted; shapes fixed for jit."""

    v_template: jnp.ndarray        # (778, 3)
    shapedirs: jnp.ndarray         # (778, 3, 10)
    posedirs: jnp.ndarray          # (778, 3, 135)
    J_regressor: jnp.ndarray       # (16, 778)
    lbs_weights: jnp.ndarray       # (778, 16)
    hands_components: jnp.ndarray  # (45, 45) PCA basis rows
    hands_mean: jnp.ndarray        # (45,)
    faces: jnp.ndarray             # (1538, 3) int32


jax.tree_util.register_pytree_node(
    ManoModel,
    lambda m: (tuple(m), None),
    lambda _, leaves: ManoModel(*leaves),
)


def load_mano_model(mano_root: str, side: str = "right") -> ManoModel:
    """Load the official MANO pickle (``{mano_root}/models/MANO_{SIDE}.pkl``)."""
    path = os.path.join(mano_root, "models", f"MANO_{side.upper()}.pkl")
    with open(path, "rb") as f:
        dd = pickle.load(f, encoding="latin1")
    J_regressor = dd["J_regressor"]
    if hasattr(J_regressor, "toarray"):
        J_regressor = J_regressor.toarray()
    shapedirs = np.asarray(dd["shapedirs"], dtype=np.float32)
    return ManoModel(
        v_template=jnp.asarray(dd["v_template"], dtype=jnp.float32),
        shapedirs=jnp.asarray(shapedirs[..., :NUM_SHAPE]),
        posedirs=jnp.asarray(dd["posedirs"], dtype=jnp.float32),
        J_regressor=jnp.asarray(J_regressor, dtype=jnp.float32),
        lbs_weights=jnp.asarray(dd["weights"], dtype=jnp.float32),
        hands_components=jnp.asarray(dd["hands_components"], dtype=jnp.float32),
        hands_mean=jnp.asarray(dd["hands_mean"], dtype=jnp.float32),
        faces=jnp.asarray(np.asarray(dd["f"], dtype=np.int32)),
    )


def _finger_rest_joints() -> np.ndarray:
    """Rest-pose joint locations of the synthetic hand (meters)."""
    j = np.zeros((NUM_JOINTS, 3), dtype=np.float32)
    # fingers splay in +x (distal) with y offsets; palm is the xy plane
    # order: index(1-3) middle(4-6) pinky(7-9) ring(10-12) thumb(13-15)
    finger_y = {1: 0.025, 4: 0.008, 7: -0.030, 10: -0.012, 13: 0.045}
    finger_x0 = {1: 0.09, 4: 0.095, 7: 0.080, 10: 0.090, 13: 0.035}
    seg = {1: 0.032, 4: 0.035, 7: 0.026, 10: 0.032, 13: 0.033}
    for base, y in finger_y.items():
        x0, s = finger_x0[base], seg[base]
        for k in range(3):
            jid = base + k
            j[jid] = [x0 + s * k, y, 0.0 if base != 13 else -0.01 * (k + 1)]
    return j


def synthetic_mano_model(seed: int = 0) -> ManoModel:
    """Deterministic stand-in hand model with real MANO shapes/topology.

    Vertices ring around each bone; LBS weights follow nearest-bone with
    soft blending; the tip vertex ids match the official model so the
    fingertip sampling in the FK layer works identically.
    """
    rng = np.random.RandomState(seed)
    joints = _finger_rest_joints()
    parents = np.array(KINTREE_PARENTS)

    # Build bones (joint -> child direction). For leaf joints extend outward.
    children = {p: c for c, p in enumerate(parents) if p >= 0}
    bone_dirs = np.zeros((NUM_JOINTS, 3), dtype=np.float32)
    for jid in range(NUM_JOINTS):
        child = [c for c in range(NUM_JOINTS) if parents[c] == jid]
        if child:
            bone_dirs[jid] = joints[child[0]] - joints[jid]
        else:
            bone_dirs[jid] = joints[jid] - joints[parents[jid]]

    # place vertices: rings along each bone + palm blob
    verts = np.zeros((NUM_VERTS, 3), dtype=np.float32)
    weights = np.zeros((NUM_VERTS, NUM_JOINTS), dtype=np.float32)
    per_joint = NUM_VERTS // NUM_JOINTS  # 48
    idx = 0
    radius = 0.009
    for jid in range(NUM_JOINTS):
        n = per_joint if jid < NUM_JOINTS - 1 else NUM_VERTS - idx
        t = rng.rand(n).astype(np.float32)
        ang = rng.rand(n).astype(np.float32) * 2 * np.pi
        d = bone_dirs[jid]
        dn = d / (np.linalg.norm(d) + 1e-8)
        ortho1 = np.cross(dn, [0.0, 0.0, 1.0])
        ortho1 /= np.linalg.norm(ortho1) + 1e-8
        ortho2 = np.cross(dn, ortho1)
        pts = (
            joints[jid][None]
            + t[:, None] * d[None]
            + radius * (np.cos(ang)[:, None] * ortho1[None] + np.sin(ang)[:, None] * ortho2[None])
        )
        verts[idx:idx + n] = pts
        w = np.zeros((n, NUM_JOINTS), dtype=np.float32)
        w[:, jid] = 1.0 - 0.3 * t
        if parents[jid] >= 0:
            w[:, parents[jid]] = 0.3 * t
        weights[idx:idx + n] = w
        idx += n
    weights /= weights.sum(1, keepdims=True)

    # pin tip vertices at the finger ends (thumb, index, middle, ring, pinky)
    tip_owner = {745: 15, 317: 3, 444: 6, 556: 12, 673: 9}
    for vid, jid in tip_owner.items():
        d = bone_dirs[jid]
        verts[vid] = joints[jid] + d * 1.2
        weights[vid] = 0.0
        weights[vid, jid] = 1.0

    # J_regressor selects the ring nearest each joint
    J_regressor = np.zeros((NUM_JOINTS, NUM_VERTS), dtype=np.float32)
    for jid in range(NUM_JOINTS):
        dist = np.linalg.norm(verts - joints[jid][None], axis=1)
        nearest = np.argsort(dist)[:8]
        w = np.exp(-dist[nearest] / 0.004)
        J_regressor[jid, nearest] = w / w.sum()
    # correct the regressor so J_regressor @ v_template == joints exactly:
    # add the residual onto the template via least squares is overkill; instead
    # shift joints to the regressed positions (internally consistent model).

    shapedirs = (rng.randn(NUM_VERTS, 3, NUM_SHAPE) * 0.001).astype(np.float32)
    posedirs = (rng.randn(NUM_VERTS, 3, 9 * (NUM_JOINTS - 1)) * 0.0005).astype(np.float32)
    comps = rng.randn(NUM_POSE_COMPS, NUM_POSE_COMPS).astype(np.float32)
    comps, _ = np.linalg.qr(comps)

    # faces: two triangle strips over consecutive vertices within each
    # bone ring (valid bounded-degree topology — real MANO's max vertex
    # valence is ~9, and downstream fast paths like the gather-only
    # vertex normals assume a small max degree); padded to 1538 with
    # DEGENERATE faces (zero area -> never rasterized, skipped by
    # incidence builders) rather than duplicates of a real face, which
    # previously created degree-795 hub vertices and 800 copies of one
    # triangle for the rasterizer to draw
    faces = []
    for jid in range(NUM_JOINTS):
        base = jid * per_joint
        n = per_joint if jid < NUM_JOINTS - 1 else NUM_VERTS - base
        for k in range(n - 2):
            faces.append([base + k, base + k + 1, base + k + 2])
        for k in range(n - 3):
            faces.append([base + k, base + k + 2, base + k + 3])
    faces = np.asarray(faces[:1538], dtype=np.int32)
    if faces.shape[0] < 1538:
        pad = np.zeros((1538 - faces.shape[0], 3), np.int32)  # degenerate
        faces = np.concatenate([faces, pad])

    # orient faces consistently outward (like the real MANO mesh) so that
    # backface culling in the rasterizer is exercisable with this stand-in:
    # flip any face whose normal points toward the skeleton
    fv = verts[faces]  # (F, 3, 3)
    normal = np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
    centroid = fv.mean(1)
    nearest = np.argmin(
        ((centroid[:, None, :] - joints[None]) ** 2).sum(-1), axis=1)
    outward = centroid - joints[nearest]
    flip = (normal * outward).sum(-1) < 0
    faces[flip] = faces[flip][:, ::-1]

    return ManoModel(
        v_template=jnp.asarray(verts),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        J_regressor=jnp.asarray(J_regressor),
        lbs_weights=jnp.asarray(weights),
        hands_components=jnp.asarray(comps),
        hands_mean=jnp.zeros((NUM_POSE_COMPS,), dtype=jnp.float32),
        faces=jnp.asarray(faces),
    )


def get_mano_model(mano_root: Optional[str] = None, side: str = "right") -> ManoModel:
    """Load the real model if the asset exists, else the synthetic one."""
    candidates = [mano_root] if mano_root else []
    candidates += ["assets/mano_v1_2", os.environ.get("MANO_ROOT", "")]
    for root in candidates:
        if root and os.path.exists(os.path.join(root, "models", f"MANO_{side.upper()}.pkl")):
            return load_mano_model(root, side)
    return synthetic_mano_model()
