"""Real-data batches through the verts-based losses and metrics.

VERDICT round-1 item 6 acceptance: an HO3D fixture batch (with YCB mesh
on disk and MANO fits in the metas) must carry HAND_VERTS_3D / HAND_POSE
/ HAND_SHAPE / OBJ_VERTS_CAN / OBJ_VERTS_3D / PADDING_MASK and drive
ManoLoss, ChamferLoss and ValMetricAR2 (verts MSSD) end-to-end
(reference: anakin/datasets/ho3d.py:253-262,415-440, hodata.py:21-62).
The fixture annotations are geometrically consistent (corners3D = R @
rest + t), which pins the OBJ_TRANSF canonical-frame offset algebra
(reference get_obj_transf_wrt_cam, ho3d.py:440-463)."""
import os
import pickle

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from artiboost_tpu.criterions.chamferloss import ChamferLoss
from artiboost_tpu.criterions.honetloss import ManoLoss
from artiboost_tpu.datasets.ho3d import HO3D
from artiboost_tpu.datasets.hoquery import Queries, SynthQueries
from artiboost_tpu.metrics.val_metric import ValMetricAR2

PRESET = {
    "USE_CACHE": False, "BBOX_EXPAND_RATIO": 1.2, "IMAGE_SIZE": [64, 64],
    "CENTER_IDX": 0, "CROP_MODEL": "root_obj",
}

OBJ = "006_mustard_bottle"
# deliberately off-center model so the canonical-frame offset matters
MESH_VERTS = np.array([
    [0.08, 0.02, 0.03], [0.12, 0.02, 0.03], [0.08, 0.06, 0.03],
    [0.08, 0.02, 0.07], [0.12, 0.06, 0.07], [0.10, 0.04, 0.05],
], np.float32)


def _bbox_corners(v):
    lo, hi = v.min(0), v.max(0)
    return np.array([[x, y, z] for x in (lo[0], hi[0])
                     for y in (lo[1], hi[1]) for z in (lo[2], hi[2])],
                    np.float32)


@pytest.fixture
def ho3d_root(tmp_path):
    root = str(tmp_path)
    base = os.path.join(root, "HO3D", "train")
    mesh_dir = os.path.join(root, "YCB_models_supp", OBJ)
    os.makedirs(mesh_dir, exist_ok=True)
    with open(os.path.join(mesh_dir, "textured_simple_ds.obj"), "w") as f:
        for v in MESH_VERTS:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        f.write("f 1 2 3\nf 4 5 6\n")

    rng = np.random.RandomState(11)
    os.makedirs(os.path.join(base, "ABF10", "meta"), exist_ok=True)
    os.makedirs(os.path.join(base, "ABF10", "rgb"), exist_ok=True)
    rest = _bbox_corners(MESH_VERTS)
    for fi in range(3):
        aa = rng.randn(3).astype(np.float64) * 0.4
        R = cv2.Rodrigues(aa)[0].astype(np.float32)
        t = np.array([0.01 * fi, 0.0, -0.5], np.float32)
        meta = {
            "camMat": np.array([[420.0, 0, 320], [0, 420.0, 240], [0, 0, 1]]),
            "handJoints3D": rng.randn(21, 3).astype(np.float32) * 0.04 + t,
            "objCorners3D": rest @ R.T + t,   # consistent with (R, t)
            "objCorners3DRest": rest,
            "objRot": aa.astype(np.float32),
            "objTrans": t,
            "objName": OBJ,
            "handPose": (rng.randn(48) * 0.1).astype(np.float32),
            "handBeta": (rng.randn(10) * 0.3).astype(np.float32),
            "handTrans": t + [0.02, 0.01, 0.0],
        }
        with open(os.path.join(base, "ABF10", "meta", f"{fi:04d}.pkl"), "wb") as fh:
            pickle.dump(meta, fh)
        cv2.imwrite(os.path.join(base, "ABF10", "rgb", f"{fi:04d}.png"),
                    (rng.rand(480, 640, 3) * 255).astype(np.uint8))
    return root


@pytest.fixture
def ds(ho3d_root, monkeypatch):
    monkeypatch.chdir(ho3d_root)
    return HO3D(DATA_PRESET=PRESET, DATA_SPLIT="train", DATA_ROOT=ho3d_root,
                SPLIT_MODE="paper", AUG=False, AUG_PARAM=None)


def test_obj_transf_consistent_with_can_frame(ds):
    """OBJ_TRANSF @ corners_can must reproduce the annotated corners —
    pins the bbox-center offset folded into the translation."""
    for i in range(len(ds)):
        transf = ds.get_obj_transf(i)
        can = ds.get_corners_can(i)
        got = can @ transf[:3, :3].T + transf[:3, 3]
        np.testing.assert_allclose(got, ds.get_corners_3d(i), atol=1e-5)
        # verts_can share the same canonical frame
        vcan = ds.get_obj_verts_can(i)
        vcam = vcan @ transf[:3, :3].T + transf[:3, 3]
        # transformed verts must live inside the corners' bbox (same rigid
        # motion of the same model)
        lo = got.min(0) - 1e-4
        hi = got.max(0) + 1e-4
        assert np.all(vcam >= lo) and np.all(vcam <= hi)


def test_batch_carries_verts_and_mano(ds):
    batch = ds.sample_batch([0, 1, 2])
    assert batch[Queries.HAND_VERTS_3D].shape == (3, 778, 3)
    assert batch[Queries.HAND_POSE].shape == (3, 48)
    assert batch[Queries.HAND_SHAPE].shape == (3, 10)
    assert batch[Queries.OBJ_VERTS_CAN].shape == (3, 6, 3)
    assert batch[Queries.OBJ_VERTS_3D].shape == (3, 6, 3)
    assert batch[Queries.PADDING_MASK].shape == (3, 6)
    # OBJ_VERTS_3D root-relative == transf @ can - root
    transf = batch[Queries.OBJ_TRANSF][0]
    v = batch[Queries.OBJ_VERTS_CAN][0] @ transf[:3, :3].T + transf[:3, 3]
    np.testing.assert_allclose(
        batch[Queries.OBJ_VERTS_3D][0],
        v - batch[Queries.ROOT_JOINT][0], atol=1e-5)


def _jb(batch):
    return {k: jnp.asarray(v) for k, v in batch.items()}


def test_mano_loss_on_real_batch(ds):
    batch = _jb(ds.sample_batch([0, 1, 2]))
    root = batch[Queries.ROOT_JOINT][:, None]
    preds = {
        "joints_3d_abs": batch[Queries.JOINTS_3D] + root,
        "hand_verts_3d_abs": batch[Queries.HAND_VERTS_3D] + root,
    }
    loss, losses = ManoLoss(LAMBDA_JOINTS_3D=1.0, LAMBDA_HAND_VERTS_3D=1.0)(
        preds, batch)
    assert float(loss) == pytest.approx(0.0, abs=1e-8)
    # perturbed preds -> positive loss
    preds["hand_verts_3d_abs"] = preds["hand_verts_3d_abs"] + 0.01
    loss2, _ = ManoLoss(LAMBDA_JOINTS_3D=1.0, LAMBDA_HAND_VERTS_3D=1.0)(
        preds, batch)
    assert float(loss2) > 1e-5


def test_chamfer_loss_on_real_batch(ds):
    batch = _jb(ds.sample_batch([0, 1, 2]))
    transf = batch[Queries.OBJ_TRANSF]
    preds = {
        "box_rot_rotmat": transf[:, :3, :3],
        "boxroot_3d_abs": transf[:, :3, 3],
    }
    loss, _ = ChamferLoss(LAMBDA_CHAMFER=1.0)(preds, batch)
    assert float(loss) == pytest.approx(0.0, abs=1e-6)
    preds = {
        "box_rot_rotmat": transf[:, :3, :3],
        "boxroot_3d_abs": transf[:, :3, 3] + 0.02,
    }
    loss2, _ = ChamferLoss(LAMBDA_CHAMFER=1.0)(preds, batch)
    assert float(loss2) > 1e-5


def test_verts_mssd_on_real_batch(ds):
    batch = ds.sample_batch([0, 1, 2])
    # tag as synth triplets so the CCV meter accumulates
    batch[SynthQueries.IS_SYNTH] = np.ones(3, np.int32)
    batch[SynthQueries.OBJ_ID] = np.zeros(3, np.int32)
    batch[SynthQueries.PERSP_ID] = np.arange(3, dtype=np.int32)
    batch[SynthQueries.GRASP_ID] = np.zeros(3, np.int32)
    batch = _jb(batch)
    transf = batch[Queries.OBJ_TRANSF]
    preds = {
        "box_rot_rotmat": transf[:, :3, :3],
        "boxroot_3d_abs": transf[:, :3, 3],
    }
    m = ValMetricAR2(USE_MSSD=True, MSSD_USE_CORNERS=False,
                     USE_HO3D_YCB=True, CCV_SHAPE=(2, 4, 4))
    m.feed(preds, batch)
    res = m.get_measures_averaged()
    assert len(res) == 3
    for v in res.values():
        assert v < 1e-2  # mm; GT pose scores ~0 MSSD
