"""DexYCB loader against a synthetic on-disk fixture: directory sweep,
s0 day-based split, label accessors (parity: ``anakin/datasets/dexycb.py``
via the dex-ycb-toolkit layout)."""
import os

import numpy as np
import pytest
import yaml

from artiboost_tpu.datasets.dexycb import DexYCB
from artiboost_tpu.datasets.hoquery import Queries

PRESET = {
    "USE_CACHE": False, "BBOX_EXPAND_RATIO": 1.2, "IMAGE_SIZE": [64, 64],
    "CENTER_IDX": 9, "CROP_MODEL": "root_obj",
    "FILTER_NO_CONTACT": False, "FILTER_THRESH": 0.0,
}


def _write_scene(root, subj, scene, cam="836212060125", n_frames=2, rng=None):
    rng = rng or np.random.RandomState(0)
    scene_dir = os.path.join(root, subj, scene)
    cam_dir = os.path.join(scene_dir, cam)
    os.makedirs(cam_dir, exist_ok=True)
    with open(os.path.join(scene_dir, "meta.yml"), "w") as f:
        yaml.safe_dump({"mano_sides": ["right"], "serials": [cam],
                        "ycb_grasp_ind": 0, "ycb_ids": [5]}, f)
    import cv2
    for fi in range(n_frames):
        j3d = rng.randn(21, 3).astype(np.float32) * 0.05 + [0, 0, 0.5]
        pose_y = np.zeros((1, 3, 4), np.float32)
        pose_y[0, :3, :3] = np.eye(3)
        pose_y[0, :3, 3] = [0, 0, 0.5]
        np.savez(os.path.join(cam_dir, f"labels_{fi:06d}.npz"),
                 joint_3d=j3d, pose_y=pose_y)
        cv2.imwrite(os.path.join(cam_dir, f"color_{fi:06d}.jpg"),
                    (rng.rand(480, 640, 3) * 255).astype(np.uint8))
    # calibration for intrinsics
    calib_dir = os.path.join(root, "calibration", "intrinsics")
    os.makedirs(calib_dir, exist_ok=True)
    with open(os.path.join(calib_dir, f"{cam}_640x480.yml"), "w") as f:
        yaml.safe_dump({"color": {"fx": 615.0, "fy": 615.0,
                                  "ppx": 320.0, "ppy": 240.0}}, f)


@pytest.fixture
def dexycb_root(tmp_path):
    root = os.path.join(str(tmp_path), "data", "DexYCB")
    _write_scene(root, "20200709-subject-01", "20200709_000001", n_frames=3)
    return os.path.join(str(tmp_path), "data")


def test_scan_and_accessors(dexycb_root, monkeypatch):
    monkeypatch.chdir(os.path.dirname(dexycb_root))
    ds = DexYCB(DATA_PRESET=PRESET, DATA_SPLIT="train", DATA_ROOT=dexycb_root,
                SPLIT_MODE="s0", AUG=False, AUG_PARAM=None)
    assert len(ds) == 3
    assert ds.get_joints_3d(0).shape == (21, 3)
    assert ds.get_obj_idx(0) == 5
    K = ds.get_cam_intr(0)
    assert K[0, 0] == 615.0 and K[0, 2] == 320.0
    transf = ds.get_obj_transf(0)
    np.testing.assert_allclose(transf[:3, 3], [0, 0, 0.5])


def test_sample_pipeline(dexycb_root, monkeypatch):
    monkeypatch.chdir(os.path.dirname(dexycb_root))
    # object mesh absent -> get_corners_can would need models/; patch it
    ds = DexYCB(DATA_PRESET=PRESET, DATA_SPLIT="train", DATA_ROOT=dexycb_root,
                SPLIT_MODE="s0", AUG=False, AUG_PARAM=None)
    ds._corner_cache = {5: np.random.RandomState(0).randn(8, 3).astype(np.float32) * 0.05}
    s = ds[0]
    assert s[Queries.IMAGE].shape == (64, 64, 3)
    assert s[Queries.JOINTS_3D].shape == (21, 3)
