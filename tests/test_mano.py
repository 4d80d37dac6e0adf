import jax
import jax.numpy as jnp
import numpy as np
import pytest

from artiboost_tpu.mano import (
    ManoLayer,
    hand_axes,
    mano_forward,
    synthetic_mano_model,
)
from artiboost_tpu.mano.layer import pca_to_axisang, rotation_center
from artiboost_tpu.mano.model import JOINT_REORDER, TIP_VERT_IDS
from artiboost_tpu.utils.transform import aa_to_rotmat


@pytest.fixture(scope="module")
def model():
    return synthetic_mano_model()


def _fwd(model, pose, shape):
    return mano_forward(model, jnp.asarray(pose), jnp.asarray(shape))


class TestManoFK:
    def test_shapes(self, model, rng):
        out = _fwd(model, rng.randn(4, 48).astype(np.float32) * 0.1,
                   rng.randn(4, 10).astype(np.float32) * 0.5)
        assert out.verts.shape == (4, 778, 3)
        assert out.joints.shape == (4, 21, 3)
        assert out.transforms_abs.shape == (4, 16, 4, 4)
        assert out.full_poses.shape == (4, 48)

    def test_rest_pose_matches_regressed_joints(self, model):
        out = _fwd(model, np.zeros((1, 48), np.float32), np.zeros((1, 10), np.float32))
        v_t = np.asarray(model.v_template)
        j_rest = np.asarray(model.J_regressor) @ v_t
        # wrist (kp 0) is FK joint 0
        np.testing.assert_allclose(np.asarray(out.joints)[0, 0], j_rest[0], atol=1e-5)
        # rest pose: verts == template
        np.testing.assert_allclose(np.asarray(out.verts)[0], v_t, atol=1e-5)

    def test_tips_are_tip_vertices(self, model, rng):
        pose = rng.randn(2, 48).astype(np.float32) * 0.2
        out = _fwd(model, pose, np.zeros((2, 10), np.float32))
        verts = np.asarray(out.verts)
        joints = np.asarray(out.joints)
        # thumb tip is kp 4 <- vertex 745 (JOINT_REORDER maps idx16 -> kp4)
        np.testing.assert_allclose(joints[:, 4], verts[:, 745], atol=1e-6)
        np.testing.assert_allclose(joints[:, 8], verts[:, 317], atol=1e-6)

    def test_global_rotation_rotates_about_root(self, model, rng):
        """Rotating only the global pose must rotate everything about the
        rest root joint (the MANO rotation center)."""
        shape = np.zeros((1, 10), np.float32)
        base = _fwd(model, np.zeros((1, 48), np.float32), shape)
        aa = np.zeros((1, 48), np.float32)
        aa[0, :3] = [0.0, 0.0, np.pi / 2]
        rot = _fwd(model, aa, shape)
        R = np.asarray(aa_to_rotmat(jnp.asarray(aa[:, :3])))[0]
        center = np.asarray(rotation_center(model, jnp.asarray(shape)))[0]
        expect = (np.asarray(base.verts)[0] - center) @ R.T + center
        np.testing.assert_allclose(np.asarray(rot.verts)[0], expect, atol=1e-4)

    def test_transforms_abs_translation_equals_fk_joints(self, model, rng):
        pose = rng.randn(3, 48).astype(np.float32) * 0.3
        out = _fwd(model, pose, np.zeros((3, 10), np.float32))
        # FK joints (MANO-native order) live in transforms_abs[..., :3, 3];
        # the first 16 of the reordered 21 come from them
        native = np.asarray(out.transforms_abs[:, :, :3, 3])
        joints = np.asarray(out.joints)
        reorder = list(JOINT_REORDER)
        for kp_idx, native_idx in enumerate(reorder):
            if native_idx < 16:
                np.testing.assert_allclose(joints[:, kp_idx], native[:, native_idx], atol=1e-5)

    def test_differentiable(self, model):
        def loss(pose):
            out = mano_forward(model, pose, jnp.zeros((1, 10)))
            return jnp.sum(out.joints ** 2)

        g = jax.grad(loss)(jnp.zeros((1, 48)) + 0.1)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_center_idx(self, model, rng):
        pose = rng.randn(2, 48).astype(np.float32) * 0.2
        out = mano_forward(model, jnp.asarray(pose), jnp.zeros((2, 10)), center_idx=9)
        np.testing.assert_allclose(np.asarray(out.joints)[:, 9], 0.0, atol=1e-6)

    def test_pca_decode(self, model, rng):
        coeffs = rng.randn(2, 3 + 12).astype(np.float32)
        full = np.asarray(pca_to_axisang(model, jnp.asarray(coeffs), ncomps=12))
        assert full.shape == (2, 48)
        np.testing.assert_allclose(full[:, :3], coeffs[:, :3], atol=1e-6)
        expect = coeffs[:, 3:] @ np.asarray(model.hands_components)[:12]
        np.testing.assert_allclose(full[:, 3:], expect, atol=1e-5)

    def test_layer_wrapper_pca(self, model, rng):
        layer = ManoLayer(model, use_pca=True, ncomps=15)
        out = layer(jnp.asarray(rng.randn(2, 18).astype(np.float32)),
                    jnp.zeros((2, 10)))
        assert out.verts.shape == (2, 778, 3)


class TestAxisLayer:
    def test_axes_orthonormal(self, model, rng):
        pose = rng.randn(4, 48).astype(np.float32) * 0.3
        out = _fwd(model, pose, np.zeros((4, 10), np.float32))
        b, u, l = hand_axes(out.joints, out.transforms_abs)
        for ax in (b, u, l):
            assert ax.shape == (4, 15, 3)
            np.testing.assert_allclose(np.linalg.norm(np.asarray(ax), axis=-1), 1.0, atol=1e-4)
        # mutually orthogonal
        np.testing.assert_allclose(np.sum(np.asarray(b) * np.asarray(l), -1), 0.0, atol=1e-4)
        np.testing.assert_allclose(np.sum(np.asarray(b) * np.asarray(u), -1), 0.0, atol=1e-4)
        np.testing.assert_allclose(np.sum(np.asarray(u) * np.asarray(l), -1), 0.0, atol=1e-4)


class TestNumpyFK:
    """Host numpy FK (datasets' per-sample path) must match the JAX layer."""

    def test_axisang_parity(self, model, rng):
        from artiboost_tpu.mano.numpy_fk import NumpyMano

        pose = rng.randn(3, 48).astype(np.float32) * 0.2
        shape = rng.randn(3, 10).astype(np.float32) * 0.5
        ref = _fwd(model, pose, shape)
        nm = NumpyMano(model)
        for i in range(3):
            verts, joints = nm(pose[i], shape[i])
            np.testing.assert_allclose(verts, np.asarray(ref.verts)[i], atol=2e-5)
            np.testing.assert_allclose(joints, np.asarray(ref.joints)[i], atol=2e-5)

    def test_pca_parity(self, model, rng):
        from artiboost_tpu.mano.numpy_fk import NumpyMano

        ncomps = 45
        coeffs = rng.randn(2, 3 + ncomps).astype(np.float32) * 0.2
        shape = rng.randn(2, 10).astype(np.float32) * 0.5
        layer = ManoLayer(model, use_pca=True, ncomps=ncomps,
                          flat_hand_mean=False)
        ref = layer(jnp.asarray(coeffs), jnp.asarray(shape))
        nm = NumpyMano(model, use_pca=True, ncomps=ncomps,
                       flat_hand_mean=False)
        for i in range(2):
            verts, joints = nm(coeffs[i], shape[i])
            np.testing.assert_allclose(verts, np.asarray(ref.verts)[i], atol=2e-5)
            np.testing.assert_allclose(joints, np.asarray(ref.joints)[i], atol=2e-5)

    def test_mirror_pose_flips_x(self, model, rng):
        """Mirrored pose under mirrored template == x-flipped hand: FK of
        the mirrored pose matches x-negated verts of the original up to
        the template's own symmetry (exact for rotations about the
        origin: here check the wrist joint stays put and the transform is
        an involution)."""
        from artiboost_tpu.mano.numpy_fk import mirror_mano_pose

        pose = rng.randn(48).astype(np.float32) * 0.3
        twice = mirror_mano_pose(mirror_mano_pose(pose))
        np.testing.assert_allclose(twice, pose, atol=1e-6)
