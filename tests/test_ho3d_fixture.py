"""HO3D loader against a synthetic on-disk fixture: split modes (paper
txt / v1 tables / v2 tables / directory fallback), npz caching, MANO
hand annotations, contact filtering, and the full sample pipeline
(parity: ``anakin/datasets/ho3d.py`` split/caching logic and
``ho3dutils`` split tables)."""
import os
import pickle

import cv2
import numpy as np
import pytest

from artiboost_tpu.datasets.ho3d import HO3D
from artiboost_tpu.datasets.hoquery import Queries

PRESET = {
    "USE_CACHE": False, "BBOX_EXPAND_RATIO": 1.2, "IMAGE_SIZE": [64, 64],
    "CENTER_IDX": 0, "CROP_MODEL": "root_obj",
}


def _write_seq(base, seq, n_frames=2, rng=None, with_mano=False):
    rng = rng or np.random.RandomState(0)
    os.makedirs(os.path.join(base, seq, "meta"), exist_ok=True)
    os.makedirs(os.path.join(base, seq, "rgb"), exist_ok=True)
    for f in range(n_frames):
        joints = rng.randn(21, 3).astype(np.float32) * 0.05 + [0, 0, -0.5]
        corners = rng.randn(8, 3).astype(np.float32) * 0.05 + [0, 0, -0.5]
        meta = {
            "camMat": np.array([[420.0, 0, 320], [0, 420.0, 240], [0, 0, 1]]),
            "handJoints3D": joints,
            "objCorners3D": corners,
            "objCorners3DRest": rng.randn(8, 3).astype(np.float32) * 0.05,
            "objRot": rng.randn(3).astype(np.float32) * 0.1,
            "objTrans": np.array([0, 0, -0.5], np.float32),
            "objName": "006_mustard_bottle",
        }
        if with_mano:
            meta["handPose"] = (rng.randn(48) * 0.1).astype(np.float32)
            meta["handBeta"] = (rng.randn(10) * 0.3).astype(np.float32)
            meta["handTrans"] = np.array([0.02, 0.01, -0.5], np.float32)
        with open(os.path.join(base, seq, "meta", f"{f:04d}.pkl"), "wb") as fh:
            pickle.dump(meta, fh)
        img = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(base, seq, "rgb", f"{f:04d}.png"), img)


@pytest.fixture
def ho3d_root(tmp_path):
    train_base = os.path.join(str(tmp_path), "HO3D", "train")
    _write_seq(train_base, "ABF10", 3, with_mano=True)
    _write_seq(train_base, "SM1", 2)   # a paper-split val sequence
    _write_seq(train_base, "MC1", 2)   # a v1-split train sequence
    return str(tmp_path)


def _mk(root, split="train", mode="paper", preset=PRESET, **kw):
    return HO3D(DATA_PRESET=preset, DATA_SPLIT=split, DATA_ROOT=root,
                SPLIT_MODE=mode, AUG=False, AUG_PARAM=None, **kw)


def test_dir_fallback_split(ho3d_root, monkeypatch):
    """No train.txt on disk: paper mode falls back to a directory sweep
    with the val-seq heuristic."""
    monkeypatch.chdir(ho3d_root)
    train = _mk(ho3d_root, "train", "paper")
    val = _mk(ho3d_root, "val", "paper")
    assert len(train) == 5   # ABF10 + MC1
    assert len(val) == 2     # SM1 only


def test_v1_split_uses_sequence_tables(ho3d_root, monkeypatch):
    """v1 mode keeps only the reference's hand-picked sequences
    (ho3dutils.get_v1_seqs): MC1 is in the filtered train table, ABF10
    and SM1 are not."""
    monkeypatch.chdir(ho3d_root)
    v1 = _mk(ho3d_root, "train", "v1")
    assert len(v1) == 2
    assert all(s["seq"] == "MC1" for s in v1.samples)


def test_paper_split_reads_official_txt(ho3d_root, monkeypatch):
    monkeypatch.chdir(ho3d_root)
    with open(os.path.join(ho3d_root, "HO3D", "train.txt"), "w") as f:
        f.write("ABF10/0000\nABF10/0002\nSM1/0001\n")
    ds = _mk(ho3d_root, "train", "paper")
    assert len(ds) == 3  # exactly the listed frames, val seqs included
    assert [s["seq"] for s in ds.samples] == ["ABF10", "ABF10", "SM1"]


def test_v2_split_intersects_tables(ho3d_root, monkeypatch):
    monkeypatch.chdir(ho3d_root)
    with open(os.path.join(ho3d_root, "HO3D", "train.txt"), "w") as f:
        # MC1 is not a v2 sequence -> dropped; order is per-seq sorted
        f.write("ABF10/0002\nABF10/0000\nMC1/0000\nSM1/0001\n")
    ds = _mk(ho3d_root, "train", "v2")
    assert [(s["seq"], os.path.basename(s["img"])) for s in ds.samples] == \
        [("ABF10", "0000.png"), ("ABF10", "0002.png"), ("SM1", "0001.png")]


def test_sample_pipeline(ho3d_root, monkeypatch):
    monkeypatch.chdir(ho3d_root)
    ds = _mk(ho3d_root, "train", "paper")
    s = ds[0]
    assert s[Queries.IMAGE].shape == (64, 64, 3)
    assert s[Queries.JOINTS_3D].shape == (21, 3)
    assert s[Queries.CORNERS_3D].shape == (8, 3)
    # OpenGL-flip: annotations store -z, camera space must be +z
    assert s[Queries.ROOT_JOINT][2] > 0
    assert s[Queries.OBJ_IDX] > 0
    batch = ds.sample_batch([0, 1, 2])
    assert batch[Queries.IMAGE].shape == (3, 64, 64, 3)
    assert np.isfinite(batch[Queries.CAM_INTR]).all()


def test_mano_annotations(ho3d_root, monkeypatch):
    """Sequences with MANO fits emit HAND_POSE/SHAPE/VERTS; the verts
    land near the annotated hand joints and the pose's global segment is
    cam-extr flipped (reference ho3d.py:253-262, 523-531)."""
    monkeypatch.chdir(ho3d_root)
    ds = _mk(ho3d_root, "train", "paper")
    # ABF10 samples carry mano; find one
    idx = next(i for i, s in enumerate(ds.samples) if s["seq"] == "ABF10")
    pose = ds.get_hand_pose(idx)
    shape = ds.get_hand_shape(idx)
    verts = ds.get_hand_verts_3d(idx)
    assert pose.shape == (48,) and shape.shape == (10,)
    assert verts.shape == (778, 3)
    # cam-extr flip puts the hand at +z like the joints
    assert verts[:, 2].mean() > 0
    sample = ds[idx]
    assert sample[Queries.HAND_POSE].shape == (48,)
    assert sample[Queries.HAND_SHAPE].shape == (10,)
    # root-relative like joints
    hv = sample[Queries.HAND_VERTS_3D]
    assert hv.shape == (778, 3)
    assert np.abs(hv).max() < 0.8
    # MC1 has no mano -> accessors return None
    mc1 = next(i for i, s in enumerate(ds.samples) if s["seq"] == "MC1")
    assert ds.get_hand_pose(mc1) is None


def test_eval_split_root_only(ho3d_root, monkeypatch):
    """Evaluation metas shipping only the wrist expand to tiled joints +
    zero MANO (reference :170-175)."""
    monkeypatch.chdir(ho3d_root)
    eval_base = os.path.join(ho3d_root, "HO3D", "evaluation")
    os.makedirs(os.path.join(eval_base, "SM1", "meta"), exist_ok=True)
    os.makedirs(os.path.join(eval_base, "SM1", "rgb"), exist_ok=True)
    meta = {
        "camMat": np.array([[420.0, 0, 320], [0, 420.0, 240], [0, 0, 1]]),
        "handJoints3D": np.array([0.0, 0.0, -0.5], np.float32),
        "objCorners3D": np.zeros((8, 3), np.float32),
        "objCorners3DRest": np.zeros((8, 3), np.float32),
        "objRot": np.zeros(3, np.float32),
        "objTrans": np.zeros(3, np.float32),
        "objName": "006_mustard_bottle",
    }
    with open(os.path.join(eval_base, "SM1", "meta", "0000.pkl"), "wb") as fh:
        pickle.dump(meta, fh)
    cv2.imwrite(os.path.join(eval_base, "SM1", "rgb", "0000.png"),
                np.zeros((480, 640, 3), np.uint8))
    ds = _mk(ho3d_root, "test", "paper")
    assert len(ds) == 1
    j = ds.get_joints_3d(0)
    assert j.shape == (21, 3)
    np.testing.assert_allclose(j, np.tile(j[:1], (21, 1)))


def test_contact_filter(ho3d_root, monkeypatch):
    """min_contact_dis drops far-from-object frames when YCB meshes are
    on disk (reference ho3dutils.py:116-146, ho3d.py:178)."""
    monkeypatch.chdir(ho3d_root)
    # a tiny object mesh at the hand's location for ABF10 / far for a new seq
    mesh_dir = os.path.join(ho3d_root, "YCB_models_supp", "006_mustard_bottle")
    os.makedirs(mesh_dir, exist_ok=True)
    with open(os.path.join(mesh_dir, "textured_simple_ds.obj"), "w") as f:
        # canonical-frame verts: objTrans (0,0,-0.5) moves them to the hand
        for v in [(0.02, 0.01, 0.0), (0.03, 0.0, 0.0), (0.02, 0.02, 0.01)]:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        f.write("f 1 2 3\n")
    # move the object far away in one new frame
    base = os.path.join(ho3d_root, "HO3D", "train")
    rng = np.random.RandomState(7)
    _write_seq(base, "ABF11", 1, rng=rng, with_mano=True)
    p = os.path.join(base, "ABF11", "meta", "0000.pkl")
    with open(p, "rb") as fh:
        meta = pickle.load(fh)
    meta["objTrans"] = np.array([5.0, 5.0, 5.0], np.float32)
    with open(p, "wb") as fh:
        pickle.dump(meta, fh)

    preset = dict(PRESET, FILTER_NO_CONTACT=True, FILTER_THRESH=50.0)
    ds = _mk(ho3d_root, "train", "paper", preset=preset)
    seqs = {s["seq"] for s in ds.samples}
    assert "ABF11" not in seqs      # far object filtered
    assert "ABF10" in seqs          # close object kept
    # obj verts flow into samples once meshes exist
    idx = next(i for i, s in enumerate(ds.samples) if s["seq"] == "ABF10")
    sample = ds[idx]
    assert Queries.OBJ_VERTS_CAN in sample
    assert sample[Queries.OBJ_VERTS_CAN].shape == (3, 3)


def test_cache_roundtrip(ho3d_root, monkeypatch):
    monkeypatch.chdir(ho3d_root)
    preset = dict(PRESET, USE_CACHE=True)
    a = _mk(ho3d_root, "train", "paper", preset=preset)
    b = _mk(ho3d_root, "train", "paper", preset=preset)  # from cache
    assert len(a) == len(b)
    np.testing.assert_allclose(a.get_joints_3d(0), b.get_joints_3d(0))
