"""HO3D loader against a synthetic on-disk fixture: annotation sweep,
paper-split filtering, npz caching, and the full sample pipeline
(parity: ``anakin/datasets/ho3d.py`` split/caching logic)."""
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


def _write_seq(base, seq, n_frames=2, rng=None):
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
        with open(os.path.join(base, seq, "meta", f"{f:04d}.pkl"), "wb") as fh:
            pickle.dump(meta, fh)
        img = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(base, seq, "rgb", f"{f:04d}.png"), img)


@pytest.fixture
def ho3d_root(tmp_path):
    train_base = os.path.join(str(tmp_path), "HO3D", "train")
    _write_seq(train_base, "ABF10", 3)
    _write_seq(train_base, "SM1", 2)  # a paper-split val sequence
    return str(tmp_path)


def test_paper_split_filters_val_seqs(ho3d_root, monkeypatch):
    monkeypatch.chdir(ho3d_root)
    train = HO3D(DATA_PRESET=PRESET, DATA_SPLIT="train", DATA_ROOT=ho3d_root,
                 SPLIT_MODE="paper", AUG=False, AUG_PARAM=None)
    val = HO3D(DATA_PRESET=PRESET, DATA_SPLIT="val", DATA_ROOT=ho3d_root,
               SPLIT_MODE="paper", AUG=False, AUG_PARAM=None)
    assert len(train) == 3   # ABF10 only
    assert len(val) == 2     # SM1 only

    # official ("v1") split keeps everything under train/
    full = HO3D(DATA_PRESET=PRESET, DATA_SPLIT="train", DATA_ROOT=ho3d_root,
                SPLIT_MODE="v1", AUG=False, AUG_PARAM=None)
    assert len(full) == 5


def test_sample_pipeline(ho3d_root, monkeypatch):
    monkeypatch.chdir(ho3d_root)
    ds = HO3D(DATA_PRESET=PRESET, DATA_SPLIT="train", DATA_ROOT=ho3d_root,
              SPLIT_MODE="paper", AUG=False, AUG_PARAM=None)
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


def test_cache_roundtrip(ho3d_root, monkeypatch):
    monkeypatch.chdir(ho3d_root)
    preset = dict(PRESET, USE_CACHE=True)
    a = HO3D(DATA_PRESET=preset, DATA_SPLIT="train", DATA_ROOT=ho3d_root,
             SPLIT_MODE="paper", AUG=False, AUG_PARAM=None)
    b = HO3D(DATA_PRESET=preset, DATA_SPLIT="train", DATA_ROOT=ho3d_root,
             SPLIT_MODE="paper", AUG=False, AUG_PARAM=None)  # from cache
    assert len(a) == len(b)
    np.testing.assert_allclose(a.get_joints_3d(0), b.get_joints_3d(0))
