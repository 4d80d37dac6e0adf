import jax
import jax.numpy as jnp
import numpy as np
import pytest

from artiboost_tpu.utils import transform as T


def _random_rotmats(rng, n):
    """Random rotations via QR of gaussians (det +1 enforced)."""
    a = rng.randn(n, 3, 3)
    q, r = np.linalg.qr(a)
    d = np.sign(np.linalg.det(q))
    q[:, :, 0] *= d[:, None]
    return q.astype(np.float32)


class TestRotationConversions:
    def test_aa_rotmat_roundtrip(self, rng):
        aa = rng.randn(64, 3).astype(np.float32) * 1.5
        R = T.aa_to_rotmat(jnp.asarray(aa))
        aa2 = T.rotmat_to_aa(R)
        R2 = T.aa_to_rotmat(aa2)
        np.testing.assert_allclose(R, R2, atol=1e-4)

    def test_aa_zero_angle(self):
        R = T.aa_to_rotmat(jnp.zeros((4, 3)))
        np.testing.assert_allclose(R, np.tile(np.eye(3), (4, 1, 1)), atol=1e-6)

    def test_aa_gradient_at_zero_finite(self):
        g = jax.grad(lambda a: T.aa_to_rotmat(a).sum())(jnp.zeros(3))
        assert np.all(np.isfinite(g))

    def test_rotmat_orthonormal(self, rng):
        aa = rng.randn(32, 3).astype(np.float32)
        R = np.asarray(T.aa_to_rotmat(jnp.asarray(aa)))
        eye = np.einsum("bij,bkj->bik", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_quat_rotmat_roundtrip(self, rng):
        R = _random_rotmats(rng, 64)
        q = T.rotmat_to_quat(jnp.asarray(R))
        R2 = T.quat_to_rotmat(q)
        np.testing.assert_allclose(R, R2, atol=1e-4)

    def test_quat_rotmat_near_pi(self):
        # 180-degree rotations hit the degenerate trace==-1 branch
        for axis in np.eye(3):
            aa = (np.pi * axis)[None].astype(np.float32)
            R = T.aa_to_rotmat(jnp.asarray(aa))
            q = T.rotmat_to_quat(R)
            R2 = T.quat_to_rotmat(q)
            np.testing.assert_allclose(R, R2, atol=1e-4)

    def test_rot6d_identity(self, rng):
        R = _random_rotmats(rng, 16)
        d6 = T.rotmat_to_rot6d(jnp.asarray(R))
        R2 = T.rot6d_to_rotmat(d6)
        np.testing.assert_allclose(R, R2, atol=1e-5)

    def test_rot6d_gram_schmidt(self, rng):
        d6 = jnp.asarray(rng.randn(32, 6).astype(np.float32))
        R = np.asarray(T.rot6d_to_rotmat(d6))
        eye = np.einsum("bij,bkj->bik", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)

    def test_ee_to_rotmat_axes(self):
        R = np.asarray(T.ee_to_rotmat(jnp.asarray([[np.pi / 2, 0.0, 0.0]], dtype=jnp.float32)))
        # rotate +y to +z
        np.testing.assert_allclose(R[0] @ np.array([0, 1, 0.0]), [0, 0, 1.0], atol=1e-6)

    def test_align_vector_to_z(self, rng):
        v = rng.randn(32, 3).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        R = np.asarray(T.align_vector_to_z(jnp.asarray(v)))
        out = np.einsum("bij,j->bi", R, np.array([0, 0, 1.0], dtype=np.float32))
        np.testing.assert_allclose(out, v, atol=1e-5)

    def test_align_vector_antiparallel(self):
        R = np.asarray(T.align_vector_to_z(jnp.asarray([[0.0, 0.0, -1.0]])))
        out = R[0] @ np.array([0, 0, 1.0])
        np.testing.assert_allclose(out, [0, 0, -1.0], atol=1e-5)


class TestUVDCodec:
    def _setup(self, rng, B=8, N=21):
        xyz = rng.randn(B, N, 3).astype(np.float32) * 0.05
        xyz[..., 2] += 0.5
        root = xyz[:, 9].copy()
        intr = np.tile(np.array([[435.0, 0, 112], [0, 435.0, 112], [0, 0, 1]], np.float32), (B, 1, 1))
        return jnp.asarray(xyz), jnp.asarray(root), jnp.asarray(intr)

    def test_roundtrip(self, rng):
        xyz, root, intr = self._setup(rng)
        uvd = T.batch_xyz2uvd(xyz, root, intr, inp_res=(224, 224))
        xyz2 = T.batch_uvd2xyz(uvd, root, intr, inp_res=(224, 224))
        np.testing.assert_allclose(xyz, xyz2, atol=1e-5)

    def test_root_depth_is_half(self, rng):
        xyz, root, intr = self._setup(rng)
        uvd = np.asarray(T.batch_xyz2uvd(xyz, root, intr, inp_res=(224, 224)))
        np.testing.assert_allclose(uvd[:, 9, 2], 0.5, atol=1e-6)

    def test_ref_bone_len(self, rng):
        joints = rng.randn(4, 21, 3).astype(np.float32)
        bone = np.asarray(T.batch_ref_bone_len(jnp.asarray(joints)))
        expect = np.linalg.norm(joints[:, 0] - joints[:, 9], axis=1, keepdims=True)
        np.testing.assert_allclose(bone, expect, rtol=1e-5)

    def test_persp_proj(self, rng):
        xyz, _, intr = self._setup(rng)
        uv = np.asarray(T.batch_persp_proj2d(xyz, intr))
        x = np.asarray(xyz)
        expect_u = 435.0 * x[..., 0] / x[..., 2] + 112.0
        np.testing.assert_allclose(uv[..., 0], expect_u, rtol=1e-4)


class TestAffine:
    def test_no_rot_center_maps_to_out_center(self):
        center = jnp.asarray([100.0, 150.0])
        A = np.asarray(T.get_affine_trans_no_rot(center, 200.0, (224, 224)))
        out = A @ np.array([100.0, 150.0, 1.0])
        np.testing.assert_allclose(out[:2], [112.0, 112.0], atol=1e-4)

    def test_affine_with_rotation_preserves_center(self):
        total, post_rot = T.get_affine_transform(
            jnp.asarray([100.0, 150.0]), 200.0, jnp.asarray([128.0, 128.0]), (224, 224), rot=0.3)
        out = np.asarray(total) @ np.array([100.0, 150.0, 1.0])
        np.testing.assert_allclose(out[:2], [112.0, 112.0], atol=1e-3)

    def test_transform_coords_invert(self, rng):
        pts = jnp.asarray(rng.rand(1, 10, 2).astype(np.float32) * 200)
        A = T.get_affine_trans_no_rot(jnp.asarray([100.0, 100.0]), 180.0, (224, 224))[None]
        fwd = T.transform_coords(pts, A)
        back = T.transform_coords(fwd, A, invert=True)
        np.testing.assert_allclose(pts, back, atol=1e-3)
