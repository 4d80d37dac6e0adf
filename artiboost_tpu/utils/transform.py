"""Rotation / projection / crop math in pure jax.numpy.

Functionally equivalent to the reference's ``anakin/utils/transform.py``
(which wraps pytorch3d): axis-angle / quaternion / rotation-matrix /
ortho-6D conversions, the normalized-uvd codec (``batch_xyz2uvd`` /
``batch_uvd2xyz``, reference :473-546), affine crop transforms
(:422-471), perspective projection (:571), and misc mesh helpers.

Everything here is jit-safe, shape-polymorphic over leading batch dims
where noted, and differentiable.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# --------------------------------------------------------------------------
# rotation representations
# --------------------------------------------------------------------------


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    rows = [
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def aa_to_rotmat(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3) (Rodrigues).

    Uses the numerically-stable small-angle form so it is differentiable
    at theta = 0.
    """
    sq = jnp.sum(aa * aa, axis=-1, keepdims=True)
    small_ = sq < 1e-12
    # make the untaken branch NaN-free under grad: replace ~0 norms by 1
    theta = jnp.sqrt(jnp.where(small_, 1.0, sq))
    theta = jnp.where(small_, 0.0, theta)
    axis = aa / jnp.where(small_, 1.0, theta)
    k = skew(axis)
    st = jnp.sin(theta)[..., None]
    ct = jnp.cos(theta)[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=aa.dtype), k.shape)
    rot = eye + st * k + (1.0 - ct) * (k @ k)
    # near-zero angle: R ~= I + skew(aa)  (first-order, keeps gradients alive)
    rot_small = eye + skew(aa)
    return jnp.where(small_[..., None], rot_small, rot)


def rotmat_to_aa(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3)."""
    return quat_to_aa(rotmat_to_quat(rot))


def quat_to_rotmat(quat: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) wxyz -> rotation matrix (..., 3, 3)."""
    q = quat / jnp.maximum(jnp.linalg.norm(quat, axis=-1, keepdims=True), 1e-8)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rows = [
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ]
    return jnp.stack(rows, axis=-2)


def rotmat_to_quat(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) wxyz.

    Branch-free variant: computes all four Shepperd candidates and picks
    the best-conditioned one with where-selects (jit/vmap friendly).
    """
    m00, m01, m02 = rot[..., 0, 0], rot[..., 0, 1], rot[..., 0, 2]
    m10, m11, m12 = rot[..., 1, 0], rot[..., 1, 1], rot[..., 1, 2]
    m20, m21, m22 = rot[..., 2, 0], rot[..., 2, 1], rot[..., 2, 2]

    def _abs_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 0.0))

    qw = 0.5 * _abs_sqrt(1.0 + m00 + m11 + m22)
    qx = 0.5 * _abs_sqrt(1.0 + m00 - m11 - m22)
    qy = 0.5 * _abs_sqrt(1.0 - m00 + m11 - m22)
    qz = 0.5 * _abs_sqrt(1.0 - m00 - m11 + m22)

    # candidate quaternions, each normalized by its dominant component
    c0 = jnp.stack([qw, (m21 - m12) / (4 * jnp.maximum(qw, 1e-8)),
                    (m02 - m20) / (4 * jnp.maximum(qw, 1e-8)),
                    (m10 - m01) / (4 * jnp.maximum(qw, 1e-8))], -1)
    c1 = jnp.stack([(m21 - m12) / (4 * jnp.maximum(qx, 1e-8)), qx,
                    (m01 + m10) / (4 * jnp.maximum(qx, 1e-8)),
                    (m02 + m20) / (4 * jnp.maximum(qx, 1e-8))], -1)
    c2 = jnp.stack([(m02 - m20) / (4 * jnp.maximum(qy, 1e-8)),
                    (m01 + m10) / (4 * jnp.maximum(qy, 1e-8)), qy,
                    (m12 + m21) / (4 * jnp.maximum(qy, 1e-8))], -1)
    c3 = jnp.stack([(m10 - m01) / (4 * jnp.maximum(qz, 1e-8)),
                    (m02 + m20) / (4 * jnp.maximum(qz, 1e-8)),
                    (m12 + m21) / (4 * jnp.maximum(qz, 1e-8)), qz], -1)

    mags = jnp.stack([qw, qx, qy, qz], -1)  # (..., 4)
    best = jnp.argmax(mags, axis=-1)  # (...,)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32).repeat(4, -1), axis=-2)[..., 0, :]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-8)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_to_aa(quat: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) wxyz -> axis-angle (..., 3)."""
    q = quat / jnp.maximum(jnp.linalg.norm(quat, axis=-1, keepdims=True), 1e-8)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    xyz = q[..., 1:]
    sin_half = jnp.linalg.norm(xyz, axis=-1, keepdims=True)  # (..., 1)
    angle = 2.0 * jnp.arctan2(sin_half[..., 0], w)[..., None]  # (..., 1)
    axis = xyz / jnp.maximum(sin_half, 1e-8)
    small = sin_half < 1e-6
    # small-angle: aa ~= 2 * xyz / w
    aa_small = 2.0 * xyz / jnp.maximum(jnp.abs(w[..., None]), 1e-8) * jnp.sign(w[..., None])
    return jnp.where(small, aa_small, axis * angle)


def aa_to_quat(aa: jnp.ndarray) -> jnp.ndarray:
    theta = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    axis = aa / jnp.maximum(theta, 1e-8)
    half = theta / 2.0
    w = jnp.cos(half)
    xyz = axis * jnp.sin(half)
    xyz_small = aa / 2.0
    small = theta < 1e-6
    return jnp.concatenate([w, jnp.where(small, xyz_small, xyz)], axis=-1)


def ee_to_rotmat(ee: jnp.ndarray) -> jnp.ndarray:
    """XYZ-intrinsic Euler angles (..., 3) -> rotation matrix."""
    x, y, z = ee[..., 0], ee[..., 1], ee[..., 2]

    def _rx(a):
        c, s = jnp.cos(a), jnp.sin(a)
        o, i = jnp.zeros_like(a), jnp.ones_like(a)
        return jnp.stack([
            jnp.stack([i, o, o], -1),
            jnp.stack([o, c, -s], -1),
            jnp.stack([o, s, c], -1),
        ], -2)

    def _ry(a):
        c, s = jnp.cos(a), jnp.sin(a)
        o, i = jnp.zeros_like(a), jnp.ones_like(a)
        return jnp.stack([
            jnp.stack([c, o, s], -1),
            jnp.stack([o, i, o], -1),
            jnp.stack([-s, o, c], -1),
        ], -2)

    def _rz(a):
        c, s = jnp.cos(a), jnp.sin(a)
        o, i = jnp.zeros_like(a), jnp.ones_like(a)
        return jnp.stack([
            jnp.stack([c, -s, o], -1),
            jnp.stack([s, c, o], -1),
            jnp.stack([o, o, i], -1),
        ], -2)

    return _rx(x) @ _ry(y) @ _rz(z)


def rotmat_proj(m: jnp.ndarray) -> jnp.ndarray:
    """Project (..., 3, 3) onto SO(3): nearest rotation by SVD with a
    determinant fix (parity: manotorch batch_rotprojs, consumed by the
    reference's rotmat-mode ManoBranch, anakin/models/mano.py:75)."""
    u, _, vt = jnp.linalg.svd(m)
    det = jnp.linalg.det(u @ vt)
    u = u.at[..., :, 2].multiply(jnp.where(det < 0, -1.0, 1.0)[..., None])
    return u @ vt


def rotmat_to_rot6d(rot: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 6): first two columns, column-major (Zhou CVPR'19)."""
    return jnp.concatenate([rot[..., :, 0], rot[..., :, 1]], axis=-1)


def rot6d_to_rotmat(d6: jnp.ndarray) -> jnp.ndarray:
    """Ortho-6D (..., 6) -> rotation matrix via Gram-Schmidt.

    Matches the reference's ``compute_rotation_matrix_from_ortho6d``
    (``anakin/utils/transform.py:578``): x = normalize(a), z =
    normalize(x×b), y = z×x; columns are (x, y, z).
    """
    a = d6[..., 0:3]
    b = d6[..., 3:6]
    x = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-8)
    z = jnp.cross(x, b)
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-8)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


compute_rotation_matrix_from_ortho6d = rot6d_to_rotmat


def homogeneous(rt: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 4) -> (..., 4, 4) by appending [0, 0, 0, 1]."""
    bottom = jnp.zeros(rt.shape[:-2] + (1, 4), dtype=rt.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([rt, bottom], axis=-2)


def rt_to_transf(rot: jnp.ndarray, tsl: jnp.ndarray) -> jnp.ndarray:
    """rot (..., 3, 3) + tsl (..., 3) -> (..., 4, 4)."""
    return homogeneous(jnp.concatenate([rot, tsl[..., :, None]], axis=-1))


def align_vector_to_z(vec: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix R with R @ z_hat = vec (batched, jit-safe).

    Parity: ``ViewEngine.caculate_align_mat``
    (``anakin/artiboost/view_engine.py:60-86``), extended to handle the
    antiparallel case smoothly.
    """
    v = vec / jnp.maximum(jnp.linalg.norm(vec, axis=-1, keepdims=True), 1e-8)
    z = jnp.zeros_like(v).at[..., 2].set(1.0)
    c = jnp.sum(z * v, axis=-1)  # cos angle, (...)
    zc = jnp.cross(z, v)
    k = skew(zc)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=vec.dtype), k.shape)
    denom = jnp.maximum(1.0 + c, 1e-6)[..., None, None]
    rot = eye + k + (k @ k) / denom
    # antiparallel: rotate pi about x-axis
    flip = jnp.broadcast_to(
        jnp.array([[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]], dtype=vec.dtype), k.shape
    )
    return jnp.where((c < -1.0 + 1e-6)[..., None, None], flip, rot)


# --------------------------------------------------------------------------
# normalized-uvd codec (reference transform.py:473-546)
# --------------------------------------------------------------------------


def batch_xyz2uvd(
    xyz: jnp.ndarray,
    root_joint: jnp.ndarray,
    intr: jnp.ndarray,
    inp_res: Sequence[int] = (256, 256),
    depth_range: float = 0.4,
    ref_bone_len: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Camera-space xyz (B, N, 3) -> normalized uvd in [0, 1]."""
    inp_res = jnp.asarray(inp_res, dtype=xyz.dtype)
    if ref_bone_len is None:
        ref_bone_len = jnp.ones((xyz.shape[0], 1), dtype=xyz.dtype)
    z = xyz[..., 2]
    xy_ = xyz[..., :2] / z[..., None]
    root_z = root_joint[:, 2:3]
    z_ = (z - root_z) / ref_bone_len
    f = jnp.stack([intr[:, 0, 0], intr[:, 1, 1]], axis=-1)[:, None, :]  # (B, 1, 2)
    c = jnp.stack([intr[:, 0, 2], intr[:, 1, 2]], axis=-1)[:, None, :]
    uv = (xy_ * f + c) / inp_res
    d = z_ / depth_range + 0.5
    return jnp.concatenate([uv, d[..., None]], axis=-1)


def batch_uvd2xyz(
    uvd: jnp.ndarray,
    root_joint: jnp.ndarray,
    intr: jnp.ndarray,
    inp_res: Sequence[int] = (256, 256),
    depth_range: float = 0.4,
    ref_bone_len: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Normalized uvd (B, N, 3) -> camera-space xyz, using the GT root depth."""
    inp_res = jnp.asarray(inp_res, dtype=uvd.dtype)
    if ref_bone_len is None:
        ref_bone_len = jnp.ones((uvd.shape[0], 1), dtype=uvd.dtype)
    uv = uvd[..., :2] * inp_res
    d = (uvd[..., 2] - 0.5) * depth_range
    root_z = root_joint[:, 2:3]
    z = d * ref_bone_len + root_z
    f = jnp.stack([intr[:, 0, 0], intr[:, 1, 1]], axis=-1)[:, None, :]
    c = jnp.stack([intr[:, 0, 2], intr[:, 1, 2]], axis=-1)[:, None, :]
    xy = (uv - c) / f * z[..., None]
    return jnp.concatenate([xy, z[..., None]], axis=-1)


def batch_ref_bone_len(joints: jnp.ndarray, ref_bone_link=(0, 9)) -> jnp.ndarray:
    """(B, 21, 3) -> (B, 1) length of the reference bone chain."""
    bone = jnp.zeros((joints.shape[0], 1), dtype=joints.dtype)
    for jid, nextjid in zip(ref_bone_link[:-1], ref_bone_link[1:]):
        bone = bone + jnp.linalg.norm(joints[:, jid] - joints[:, nextjid], axis=1, keepdims=True)
    return bone


def batch_persp_proj2d(verts: jnp.ndarray, camintr: jnp.ndarray) -> jnp.ndarray:
    """Project (B, N, 3) points with (B, 3, 3) intrinsics -> (B, N, 2) pixels."""
    hom = jnp.einsum("bij,bnj->bni", camintr, verts)
    return hom[..., :2] / jnp.maximum(hom[..., 2:], 1e-8)


# --------------------------------------------------------------------------
# affine crop transforms (host/np + jit-safe variants)
# --------------------------------------------------------------------------


def get_affine_trans_no_rot(center: jnp.ndarray, scale, res) -> jnp.ndarray:
    """2D affine mapping a square crop (center, scale) to an out_res image.

    Parity: reference ``get_affine_trans_no_rot`` (transform.py:461).
    Batched over leading dims of ``center`` (..., 2).
    """
    center = jnp.asarray(center)
    scale = jnp.asarray(scale, dtype=center.dtype)
    res0 = float(res[0])
    res1 = float(res[1])
    scale_ratio = res0 / res1
    a00 = res0 / scale
    a11 = res1 / scale * scale_ratio
    a02 = res0 * (-center[..., 0] / scale + 0.5)
    a12 = res1 * (-center[..., 1] / scale * scale_ratio + 0.5)
    zero = jnp.zeros_like(a00)
    one = jnp.ones_like(a00)
    rows = [
        jnp.stack([a00, zero, a02], -1),
        jnp.stack([zero, a11, a12], -1),
        jnp.stack([zero, zero, one], -1),
    ]
    return jnp.stack(rows, -2)


def get_affine_transform(center, scale, optical_center, out_res, rot=0.0):
    """Affine crop transform with in-plane rotation about the optical center.

    Returns (total_trans, affine_post_rot), both (..., 3, 3).
    Parity: reference ``get_affine_transform`` (transform.py:432-458).
    """
    center = jnp.asarray(center)
    rot = jnp.asarray(rot, dtype=center.dtype)
    cs, sn = jnp.cos(rot), jnp.sin(rot)
    zero = jnp.zeros_like(cs)
    one = jnp.ones_like(cs)
    rot_mat = jnp.stack([
        jnp.stack([cs, -sn, zero], -1),
        jnp.stack([sn, cs, zero], -1),
        jnp.stack([zero, zero, one], -1),
    ], -2)
    hom_center = jnp.concatenate([center, jnp.ones_like(center[..., :1])], -1)
    origin_rot_center = jnp.einsum("...ij,...j->...i", rot_mat, hom_center)[..., :2]
    oc = jnp.asarray(optical_center, dtype=center.dtype)
    t_mat = jnp.broadcast_to(jnp.eye(3, dtype=center.dtype), rot_mat.shape)
    t_mat = t_mat.at[..., 0, 2].set(-oc[..., 0]).at[..., 1, 2].set(-oc[..., 1])
    t_inv = t_mat.at[..., :2, 2].multiply(-1.0)
    transformed_center = jnp.einsum(
        "...ij,...j->...i", t_inv @ rot_mat @ t_mat, hom_center
    )
    post_rot_trans = get_affine_trans_no_rot(origin_rot_center, scale, out_res)
    total_trans = post_rot_trans @ rot_mat
    affine_post_rot = get_affine_trans_no_rot(transformed_center[..., :2], scale, out_res)
    return total_trans, affine_post_rot


def transform_coords(pts: jnp.ndarray, affine_trans: jnp.ndarray, invert: bool = False) -> jnp.ndarray:
    """Apply a (..., 3, 3) affine to (..., N, 2) points."""
    if invert:
        affine_trans = jnp.linalg.inv(affine_trans)
    hom = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    out = jnp.einsum("...ij,...nj->...ni", affine_trans, hom)
    return out[..., :2]


def center_vert_bbox(vertices: np.ndarray, bbox_center=None, bbox_scale=None, scale=False):
    """Center mesh vertices on their bbox center (host-side, numpy)."""
    if bbox_center is None:
        bbox_center = (vertices.min(0) + vertices.max(0)) / 2
    vertices = vertices - bbox_center
    if scale:
        if bbox_scale is None:
            bbox_scale = np.linalg.norm(vertices, 2, 1).max()
        vertices = vertices / bbox_scale
    else:
        bbox_scale = 1
    return vertices, bbox_center, bbox_scale


def mano_to_openpose(joints: jnp.ndarray, reorder=None) -> jnp.ndarray:
    """Reorder MANO-native 21 joints to the openpose/HO3D ordering."""
    if reorder is None:
        reorder = MANO_TO_OPENPOSE_ORDER
    return joints[..., jnp.asarray(reorder), :]


# MANO FK emits [wrist, 4xindex, 4xmiddle, 4xpinky, 4xring, 4xthumb] + tips;
# this permutation produces the conventional 21-kp order used everywhere else.
MANO_TO_OPENPOSE_ORDER = [0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11, 12, 19, 7, 8, 9, 20]
