import jax
import jax.numpy as jnp
import numpy as np
import pytest

from artiboost_tpu.criterions import build_criterion
from artiboost_tpu.criterions.alignloss import procrustes_align
from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.ops.chamfer import chamfer_distance, pairwise_sqdist
from artiboost_tpu.utils.transform import aa_to_rotmat


def _fake_batch(rng, B=4):
    joints = rng.randn(B, 21, 3).astype(np.float32) * 0.05
    corners = rng.randn(B, 8, 3).astype(np.float32) * 0.05
    root = rng.randn(B, 3).astype(np.float32) + [0, 0, 0.5]
    verts = rng.randn(B, 100, 3).astype(np.float32) * 0.05
    targs = {
        Queries.JOINTS_3D: jnp.asarray(joints),
        Queries.CORNERS_3D: jnp.asarray(corners),
        Queries.ROOT_JOINT: jnp.asarray(root),
        Queries.JOINTS_VIS: jnp.ones((B, 21), jnp.float32),
        Queries.CORNERS_VIS: jnp.ones((B, 8), jnp.float32),
        Queries.OBJ_IDX: jnp.asarray(rng.randint(1, 22, size=(B,)).astype(np.int32)),
        Queries.CORNERS_CAN: jnp.asarray(corners),
        Queries.OBJ_TRANSF: jnp.tile(jnp.eye(4), (B, 1, 1)),
        Queries.OBJ_VERTS_CAN: jnp.asarray(verts),
        Queries.OBJ_VERTS_3D: jnp.asarray(verts),
        Queries.PADDING_MASK: jnp.ones((B, 100), jnp.float32),
        Queries.HAND_VERTS_3D: jnp.asarray(rng.randn(B, 778, 3).astype(np.float32) * 0.05),
    }
    preds = {
        "joints_3d_abs": jnp.asarray(joints + root[:, None]),
        "corners_3d_abs": jnp.asarray(corners + root[:, None]),
        "boxroot_3d_abs": jnp.asarray(root[:, None]),
        "box_rot_rotmat": jnp.tile(jnp.eye(3), (B, 1, 1)),
        "mano_shape": jnp.asarray(rng.randn(B, 10).astype(np.float32)),
        "mano_pca_pose": jnp.asarray(rng.randn(B, 18).astype(np.float32)),
        "hand_verts_3d_abs": targs[Queries.HAND_VERTS_3D] + jnp.asarray(root[:, None]),
    }
    return preds, targs


CRITERION_CFG = {
    "LAMBDAS": [0.5, 0.2, 0.1],
    "CRITERION": [
        {"TYPE": "JointsLoss", "LAMBDA_JOINTS_3D": 1.0, "LAMBDA_CORNERS_3D": 0.2},
        {"TYPE": "HandOrdLoss"},
        {"TYPE": "SceneOrdLoss"},
    ],
}


class TestCriterion:
    def test_perfect_prediction_near_zero(self, rng, key):
        criterion = build_criterion(CRITERION_CFG)
        preds, targs = _fake_batch(rng)
        total, losses = criterion.compute_losses(preds, targs, key)
        assert float(total) < 1e-5
        assert "final_loss" in losses and "joints_3d_loss" in losses

    def test_wrong_prediction_positive(self, rng, key):
        criterion = build_criterion(CRITERION_CFG)
        preds, targs = _fake_batch(rng)
        preds = dict(preds)
        preds["joints_3d_abs"] = preds["joints_3d_abs"] + 0.1
        preds["corners_3d_abs"] = preds["corners_3d_abs"][:, ::-1] * -1.0
        total, _ = criterion.compute_losses(preds, targs, key)
        assert float(total) > 1e-4

    def test_jit_and_grad(self, rng, key):
        criterion = build_criterion(CRITERION_CFG)
        preds, targs = _fake_batch(rng)

        @jax.jit
        def loss_fn(j_abs):
            p = dict(preds)
            p["joints_3d_abs"] = j_abs
            return criterion.compute_losses(p, targs, key)[0]

        g = jax.grad(loss_fn)(preds["joints_3d_abs"] + 0.05)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_visibility_mask_suppresses_loss(self, rng, key):
        criterion = build_criterion({
            "LAMBDAS": [1.0],
            "CRITERION": [{"TYPE": "JointsLoss", "LAMBDA_JOINTS_3D": 1.0}],
        })
        preds, targs = _fake_batch(rng)
        preds = dict(preds)
        preds["joints_3d_abs"] = preds["joints_3d_abs"] + 100.0  # grossly wrong
        targs = dict(targs)
        targs[Queries.JOINTS_VIS] = jnp.zeros((4, 21), jnp.float32)  # all invisible
        total, _ = criterion.compute_losses(preds, targs, key)
        assert float(total) < 1e-6


class TestSymCornerLoss:
    def test_identity_sym_equals_mse(self, rng, key):
        cfg = {"LAMBDAS": [1.0],
               "CRITERION": [{"TYPE": "SymCornerLoss", "LAMBDA_SYM_CORNERS_3D": 1.0}]}
        criterion = build_criterion(cfg)
        preds, targs = _fake_batch(rng)
        # with identity OBJ_TRANSF and identity syms: GT corners == corners_can
        preds = dict(preds)
        preds["corners_3d_abs"] = targs[Queries.CORNERS_CAN]
        total, _ = criterion.compute_losses(preds, targs, key)
        assert float(total) < 1e-8

    def test_discrete_symmetry_min(self, key, rng):
        # object 1 has a 180-deg z-rotation symmetry; prediction matching the
        # flipped corners should incur ~0 loss
        import artiboost_tpu.utils.bop_sym as bop_sym
        from artiboost_tpu.criterions.symcornerloss import SymCornerLoss

        flip = np.eye(4)
        flip[:3, :3] = np.asarray(aa_to_rotmat(jnp.asarray([0.0, 0.0, np.pi])))
        info = {"1": {"symmetries_discrete": [flip.reshape(-1).tolist()]}}
        loss = SymCornerLoss(LAMBDA_SYM_CORNERS_3D=1.0, MODEL_INFO_PATH=info)

        preds, targs = _fake_batch(rng, B=2)
        targs = dict(targs)
        targs[Queries.OBJ_IDX] = jnp.asarray([1, 1])
        corners = np.asarray(targs[Queries.CORNERS_CAN])
        flipped = corners @ flip[:3, :3].T
        preds = dict(preds)
        preds["corners_3d_abs"] = jnp.asarray(flipped)
        total, _ = loss(preds, targs, key)
        assert float(total) < 1e-8


class TestChamfer:
    def test_pairwise_dist_matches_numpy(self, rng):
        x = rng.randn(2, 50, 3).astype(np.float32)
        y = rng.randn(2, 70, 3).astype(np.float32)
        d = np.asarray(pairwise_sqdist(jnp.asarray(x), jnp.asarray(y)))
        expect = ((x[:, :, None] - y[:, None]) ** 2).sum(-1)
        np.testing.assert_allclose(d, expect, atol=1e-4)

    def test_chamfer_zero_for_same_cloud(self, rng):
        x = jnp.asarray(rng.randn(2, 50, 3).astype(np.float32))
        dxy, dyx = chamfer_distance(x, x)
        np.testing.assert_allclose(np.asarray(dxy), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dyx), 0.0, atol=1e-5)

    def test_chamfer_mask_excludes_outliers(self, rng):
        x = rng.randn(1, 10, 3).astype(np.float32)
        y = np.concatenate([x, np.full((1, 5, 3), 100.0, np.float32)], axis=1)
        mask_y = np.concatenate([np.ones((1, 10)), np.zeros((1, 5))], 1).astype(np.float32)
        dxy, dyx = chamfer_distance(jnp.asarray(x), jnp.asarray(y), mask_y=jnp.asarray(mask_y))
        np.testing.assert_allclose(np.asarray(dxy), 0.0, atol=1e-5)
        # masked y points contribute 0
        np.testing.assert_allclose(np.asarray(dyx)[0, 10:], 0.0, atol=1e-6)


class TestAlign:
    def test_procrustes_recovers_rotation(self, rng):
        x = rng.randn(3, 21, 3).astype(np.float32)
        R = np.asarray(aa_to_rotmat(jnp.asarray(rng.randn(3, 3).astype(np.float32))))
        pred = np.einsum("bij,bnj->bni", R, x) * 1.7 + rng.randn(3, 1, 3).astype(np.float32)
        aligned = np.asarray(procrustes_align(jnp.asarray(x), jnp.asarray(pred)))
        np.testing.assert_allclose(aligned, x, atol=1e-4)
