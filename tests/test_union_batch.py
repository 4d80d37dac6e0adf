"""Masked-union mixed-batch assembly (VERDICT r3 item 1).

The fused train step and ``ArtiBoostLoader.__iter__`` merge real and
synth halves over the key UNION: missing keys are zero-filled and
per-sample masked (``utils/batching.py``), and every loss folds the
mask in so padded samples contribute exactly zero gradient — matching
the reference where every configured loss sees every batch
(``anakin/criterions/criterion.py:57-67``).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from artiboost_tpu.criterions.alignloss import AlignLoss
from artiboost_tpu.criterions.chamferloss import ChamferLoss
from artiboost_tpu.criterions.criterion import Criterion
from artiboost_tpu.criterions.honetloss import ManoLoss, ObjLoss
from artiboost_tpu.criterions.jointloss import JointsLoss
from artiboost_tpu.criterions.ordinal import HandOrdLoss, SceneOrdLoss
from artiboost_tpu.criterions.symcornerloss import SymCornerLoss
from artiboost_tpu.datasets.hoquery import Queries, SynthQueries
from artiboost_tpu.utils.batching import KEY_VALID, key_validity, union_concat

NV = 64  # object verts per sample


def _half(rng, B, with_mano: bool, with_obj: bool, is_synth: int):
    """A half-batch in the trainer's schema; optionally missing the MANO
    keys (like a dataset without hand annotations) or the object-geometry
    keys (like a synth pipeline without canonical verts)."""
    joints = rng.randn(B, 21, 3).astype(np.float32) * 0.05
    corners = rng.randn(B, 8, 3).astype(np.float32) * 0.05
    root = (rng.randn(B, 3).astype(np.float32) * 0.01) + [0, 0, 0.5]
    part = {
        Queries.IMAGE: jnp.asarray(rng.rand(B, 32, 32, 3).astype(np.float32) - 0.5),
        Queries.CAM_INTR: jnp.tile(jnp.eye(3, dtype=jnp.float32) * 100.0, (B, 1, 1)),
        Queries.JOINTS_3D: jnp.asarray(joints),
        Queries.CORNERS_3D: jnp.asarray(corners),
        Queries.ROOT_JOINT: jnp.asarray(root),
        Queries.JOINTS_VIS: jnp.ones((B, 21), jnp.float32),
        Queries.CORNERS_VIS: jnp.ones((B, 8), jnp.float32),
        SynthQueries.IS_SYNTH: jnp.full((B,), is_synth, jnp.int32),
        SynthQueries.OBJ_ID: jnp.full((B,), 0 if is_synth else -1, jnp.int32),
        SynthQueries.PERSP_ID: jnp.full((B,), 0 if is_synth else -1, jnp.int32),
        SynthQueries.GRASP_ID: jnp.full((B,), 0 if is_synth else -1, jnp.int32),
    }
    if with_obj:
        verts = rng.randn(B, NV, 3).astype(np.float32) * 0.05
        part.update({
            Queries.OBJ_IDX: jnp.asarray(rng.randint(1, 22, size=(B,)).astype(np.int32)),
            Queries.CORNERS_CAN: jnp.asarray(corners),
            Queries.OBJ_TRANSF: jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1)),
            Queries.OBJ_VERTS_CAN: jnp.asarray(verts),
            Queries.OBJ_VERTS_3D: jnp.asarray(verts),
            Queries.PADDING_MASK: jnp.ones((B, NV), jnp.float32),
        })
    if with_mano:
        part.update({
            Queries.HAND_VERTS_3D: jnp.asarray(rng.randn(B, 778, 3).astype(np.float32) * 0.05),
            Queries.HAND_POSE: jnp.asarray(rng.randn(B, 48).astype(np.float32) * 0.1),
            Queries.HAND_SHAPE: jnp.asarray(rng.randn(B, 10).astype(np.float32) * 0.1),
        })
    return part


def _losses_5():
    loss_list = [
        JointsLoss(LAMBDA_JOINTS_3D=1.0, LAMBDA_CORNERS_3D=1.0),
        ManoLoss(LAMBDA_JOINTS_3D=0.0, LAMBDA_HAND_VERTS_3D=1.0,
                 LAMBDA_SHAPE_REG=0.0, LAMBDA_POSE_REG=0.0),
        ObjLoss(LAMBDA_OBJ_VERTS_3D=1.0),
        ChamferLoss(LAMBDA_CHAMFER=1.0),
        SymCornerLoss(LAMBDA_SYM_CORNERS_3D=1.0),
    ]
    return Criterion({"LAMBDAS": [1.0] * len(loss_list)}, loss_list)


def _preds_from(batch, delta: float, rng):
    """Imperfect predictions (random non-rigid noise of scale ``delta`` —
    a rigid offset would be nulled by AlignLoss's Procrustes step) for every
    head the five losses read; garbage where the batch zero-filled targets."""
    B = batch[Queries.IMAGE].shape[0]
    root = batch[Queries.ROOT_JOINT][:, None]

    def jit_(x):
        return x + rng.randn(*np.shape(x)).astype(np.float32) * delta

    return {
        "joints_3d_abs": jit_(batch[Queries.JOINTS_3D] + root),
        "corners_3d_abs": jit_(batch[Queries.CORNERS_3D] + root),
        "hand_verts_3d_abs": jit_(batch[Queries.HAND_VERTS_3D] + root),
        "boxroot_3d_abs": jit_(root),
        "box_rot_rotmat": jnp.tile(jnp.eye(3, dtype=jnp.float32), (B, 1, 1)),
        "mano_shape": jnp.asarray(rng.randn(B, 10).astype(np.float32)),
        "mano_pca_pose": jnp.asarray(rng.randn(B, 18).astype(np.float32)),
    }


class TestUnionConcat:
    def test_identical_keys_no_mask(self, rng):
        a = _half(rng, 4, with_mano=True, with_obj=True, is_synth=0)
        b = _half(rng, 4, with_mano=True, with_obj=True, is_synth=1)
        out = union_concat([a, b], "test")
        assert KEY_VALID not in out
        assert out[Queries.IMAGE].shape[0] == 8

    def test_fill_and_mask(self, rng):
        real = _half(rng, 4, with_mano=False, with_obj=True, is_synth=0)
        real[Queries.SAMPLE_IDX] = jnp.arange(4, dtype=jnp.int32)
        synth = _half(rng, 4, with_mano=True, with_obj=False, is_synth=1)
        out = union_concat([real, synth], "test")
        # shapes: union keys, concat batch
        assert out[Queries.HAND_VERTS_3D].shape == (8, 778, 3)
        assert out[Queries.OBJ_VERTS_3D].shape == (8, NV, 3)
        # fills: zeros for floats, -1 for id ints
        np.testing.assert_array_equal(np.asarray(out[Queries.HAND_VERTS_3D][:4]), 0.0)
        np.testing.assert_array_equal(np.asarray(out[Queries.SAMPLE_IDX][4:]), -1)
        # masks mark exactly the filled side
        kv = out[KEY_VALID]
        np.testing.assert_array_equal(np.asarray(kv[Queries.HAND_VERTS_3D]),
                                      [0, 0, 0, 0, 1, 1, 1, 1])
        np.testing.assert_array_equal(np.asarray(kv[Queries.OBJ_VERTS_3D]),
                                      [1, 1, 1, 1, 0, 0, 0, 0])
        # always-present keys carry no mask entry
        assert Queries.JOINTS_3D not in kv
        # key_validity ANDs masks; None for unpadded keys
        assert key_validity(out, Queries.JOINTS_3D) is None
        m = key_validity(out, Queries.HAND_VERTS_3D, Queries.OBJ_VERTS_3D)
        np.testing.assert_array_equal(np.asarray(m), 0.0)

    def test_union_of_union_composes(self, rng):
        real = _half(rng, 2, with_mano=False, with_obj=True, is_synth=0)
        synth = _half(rng, 2, with_mano=True, with_obj=False, is_synth=1)
        ab = union_concat([real, synth], "test")
        c = _half(rng, 2, with_mano=True, with_obj=True, is_synth=1)
        out = union_concat([ab, c], "test")
        kv = out[KEY_VALID]
        np.testing.assert_array_equal(np.asarray(kv[Queries.HAND_VERTS_3D]),
                                      [0, 0, 1, 1, 1, 1])
        np.testing.assert_array_equal(np.asarray(kv[Queries.OBJ_VERTS_3D]),
                                      [1, 1, 0, 0, 1, 1])

    def test_inside_jit(self, rng):
        real = _half(rng, 2, with_mano=False, with_obj=True, is_synth=0)
        synth = _half(rng, 2, with_mano=True, with_obj=False, is_synth=1)

        @jax.jit
        def f(a, b):
            return union_concat([a, b], "test")[Queries.HAND_VERTS_3D]

        out = f(real, synth)
        np.testing.assert_array_equal(np.asarray(out[:2]), 0.0)


class TestMaskedLosses:
    """Each loss on a union batch: finite, nonzero where supervised, and
    exactly zero gradient into padded samples."""

    def _union(self, rng):
        real = _half(rng, 4, with_mano=False, with_obj=True, is_synth=0)
        synth = _half(rng, 4, with_mano=True, with_obj=False, is_synth=1)
        return union_concat([real, synth], "test")

    @pytest.mark.parametrize("loss_cls,head,valid_rows", [
        (lambda: ManoLoss(LAMBDA_HAND_VERTS_3D=1.0), "hand_verts_3d_abs", slice(4, 8)),
        (lambda: ObjLoss(LAMBDA_OBJ_VERTS_3D=1.0), "boxroot_3d_abs", slice(0, 4)),
        (lambda: ChamferLoss(LAMBDA_CHAMFER=1.0), "boxroot_3d_abs", slice(0, 4)),
        (lambda: SymCornerLoss(LAMBDA_SYM_CORNERS_3D=1.0), "corners_3d_abs", slice(0, 4)),
        (lambda: JointsLoss(LAMBDA_JOINTS_3D=1.0), "joints_3d_abs", slice(0, 8)),
        (lambda: AlignLoss(LAMBDA_PROCRUSTES_ALIGN=1.0), "joints_3d_abs", slice(0, 8)),
    ])
    def test_masked_grad(self, rng, key, loss_cls, head, valid_rows):
        batch = self._union(rng)
        loss = loss_cls()
        preds0 = _preds_from(batch, 0.05, rng)

        def f(x):
            p = dict(preds0)
            p[head] = x
            return loss(p, batch, key=key)[0]

        val = float(f(preds0[head]))
        assert np.isfinite(val) and val > 1e-8, f"{type(loss).__name__} value {val}"
        g = np.asarray(jax.grad(f)(preds0[head]))
        assert np.all(np.isfinite(g))
        valid = np.zeros(8, bool)
        valid[valid_rows] = True
        # gradient flows into supervised rows...
        assert np.abs(g[valid]).max() > 0.0, type(loss).__name__
        # ...and is exactly zero into padded rows
        if not valid.all():
            np.testing.assert_array_equal(g[~valid], 0.0)

    def test_padded_targets_do_not_change_loss(self, rng, key):
        """Garbage in the zero-filled region must be invisible to every loss."""
        batch = self._union(rng)
        crit = _losses_5()
        preds = _preds_from(batch, 0.05, rng)
        total0, _ = crit.compute_losses(preds, batch, key)
        poisoned = dict(batch)
        poisoned[Queries.HAND_VERTS_3D] = batch[Queries.HAND_VERTS_3D].at[:4].set(1e3)
        poisoned[Queries.OBJ_VERTS_3D] = batch[Queries.OBJ_VERTS_3D].at[4:].set(1e3)
        poisoned[Queries.OBJ_TRANSF] = batch[Queries.OBJ_TRANSF].at[4:].set(7.0)
        total1, _ = crit.compute_losses(preds, poisoned, key)
        np.testing.assert_allclose(float(total0), float(total1), rtol=1e-6)

    def test_all_ones_mask_matches_unmasked(self, rng, key):
        """With every key on both sides the union path is bit-identical to
        a plain concatenate (no KEY_VALID emitted, losses untouched)."""
        a = _half(rng, 4, with_mano=True, with_obj=True, is_synth=0)
        b = _half(rng, 4, with_mano=True, with_obj=True, is_synth=1)
        out = union_concat([a, b], "test")
        assert KEY_VALID not in out
        crit = _losses_5()
        preds = _preds_from(out, 0.05, rng)
        total, losses = crit.compute_losses(preds, out, key)
        assert np.isfinite(float(total)) and float(total) > 0


class _StubArch(nn.Module):
    """Tiny arch with every head the five losses read; gradients flow from
    the image through a Dense trunk."""

    @nn.compact
    def __call__(self, batch, train=False):
        img = batch[Queries.IMAGE]
        B = img.shape[0]
        feat = nn.Dense(32)(jnp.mean(img, axis=(1, 2)))
        root = batch[Queries.ROOT_JOINT][:, None]

        def head(n):
            return nn.Dense(n)(feat)

        return {
            "joints_3d_abs": head(63).reshape(B, 21, 3) + root,
            "corners_3d_abs": head(24).reshape(B, 8, 3) + root,
            "hand_verts_3d_abs": head(778 * 3).reshape(B, 778, 3) + root,
            "boxroot_3d_abs": head(3).reshape(B, 1, 3) + root,
            "box_rot_rotmat": head(9).reshape(B, 3, 3)
            + jnp.eye(3, dtype=jnp.float32),
            "mano_shape": head(10),
            "mano_pca_pose": head(18),
        }


def test_fused_step_union_all_losses(rng):
    """VERDICT r3 item 1 done-when: the fused step with JointsLoss + ManoLoss
    + ObjLoss + ChamferLoss + SymCornerLoss on a mixed batch where each side
    lacks keys the other has — nonzero gradients flow from every loss."""
    import optax

    from artiboost_tpu.parallel.train_state import (
        create_train_state, make_fused_train_step)

    real = _half(rng, 4, with_mano=False, with_obj=True, is_synth=0)
    real[Queries.SAMPLE_IDX] = jnp.arange(4, dtype=jnp.int32)
    synth_proto = _half(rng, 4, with_mano=True, with_obj=False, is_synth=1)

    def synth_fn(key, gen, sidx):  # stands in for the renderer pipeline
        jitter = jax.random.normal(key, (1,)) * 0.0
        return {k: v + jitter[0] if jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating) else v
                for k, v in synth_proto.items()}

    crit = _losses_5()
    arch = _StubArch()
    optimizer = optax.adam(1e-3)
    state = create_train_state(arch, optimizer, real, jax.random.PRNGKey(0))
    fused = make_fused_train_step(arch, crit, optimizer, synth_fn, mesh=None)
    p_before = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, preds, losses, batch = fused(state, real, None, None,
                                        jax.random.PRNGKey(1))
    # every configured loss saw the batch and produced a nonzero value
    for name in ("joints_3d_loss", "corners_3d_loss", "hand_verts_3d_loss",
                 "obj_verts_3d_loss", "chamfer_loss", "sym_corners_3d_loss"):
        v = float(losses[name])
        assert np.isfinite(v) and v > 1e-9, (name, v)
    assert np.isfinite(float(losses["final_loss"]))
    # params moved (gradients flowed)
    p_after = jax.tree_util.tree_leaves(state.params)[0]
    assert float(jnp.abs(p_after - p_before).max()) > 0
    # merged batch carries the union + masks
    assert batch[Queries.HAND_VERTS_3D].shape[0] == 8
    kv = batch[KEY_VALID]
    np.testing.assert_array_equal(np.asarray(kv[Queries.HAND_VERTS_3D]),
                                  [0, 0, 0, 0, 1, 1, 1, 1])

    # per-loss gradient flow: zeroing one loss's supervision changes grads
    def grads_with(hand_lambda):
        losses5 = _losses_5()
        losses5._loss_lambdas["ManoLoss"] = hand_lambda

        def loss_fn(params):
            p = arch.apply({"params": params}, batch, train=True)
            return losses5.compute_losses(p, batch, jax.random.PRNGKey(2))[0]

        return jax.grad(loss_fn)(state.params)

    g1 = grads_with(1.0)
    g0 = grads_with(0.0)
    diff = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g0)))
    assert diff > 0, "ManoLoss contributes no gradient on the union batch"


class TestRootJoinValidity:
    """ADVICE r4: abs targets are built as ``targ + root`` — a sample whose
    ROOT_JOINT was zero-filled by the union must contribute zero loss and
    zero gradient even when the primary key is annotated."""

    def _root_padded_union(self, rng):
        a = _half(rng, 4, with_mano=True, with_obj=True, is_synth=0)
        b = _half(rng, 4, with_mano=True, with_obj=True, is_synth=1)
        del b[Queries.ROOT_JOINT]
        return union_concat([a, b], "test")

    def test_poisoned_root_invisible(self, rng, key):
        batch = self._root_padded_union(rng)
        assert Queries.ROOT_JOINT in batch[KEY_VALID]
        crit = _losses_5()
        preds = _preds_from(batch, 0.05, rng)
        total0, _ = crit.compute_losses(preds, batch, key)
        poisoned = dict(batch)
        poisoned[Queries.ROOT_JOINT] = batch[Queries.ROOT_JOINT].at[4:].set(1e3)
        total1, _ = crit.compute_losses(preds, poisoned, key)
        np.testing.assert_allclose(float(total0), float(total1), rtol=1e-6)

    @pytest.mark.parametrize("loss_cls,head", [
        (lambda: JointsLoss(LAMBDA_JOINTS_3D=1.0, LAMBDA_CORNERS_3D=1.0),
         "joints_3d_abs"),
        (lambda: ManoLoss(LAMBDA_JOINTS_3D=1.0, LAMBDA_HAND_VERTS_3D=1.0),
         "hand_verts_3d_abs"),
        (lambda: AlignLoss(LAMBDA_PROCRUSTES_ALIGN=1.0), "joints_3d_abs"),
        (lambda: ObjLoss(LAMBDA_OBJ_VERTS_3D=1.0), "boxroot_3d_abs"),
    ])
    def test_zero_grad_into_root_padded_rows(self, rng, key, loss_cls, head):
        batch = self._root_padded_union(rng)
        loss = loss_cls()
        preds0 = _preds_from(batch, 0.05, rng)

        def f(x):
            p = dict(preds0)
            p[head] = x
            return loss(p, batch, key=key)[0]

        g = np.asarray(jax.grad(f)(preds0[head]))
        assert np.all(np.isfinite(g))
        assert np.abs(g[:4]).max() > 0.0, type(loss).__name__
        np.testing.assert_array_equal(g[4:], 0.0)
