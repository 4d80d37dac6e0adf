"""DexYCB loader against a synthetic on-disk fixture: directory sweep,
s0-s3 toolkit split membership, label accessors, MANO annotations
(parity: ``anakin/datasets/dexycb.py`` via the dex-ycb-toolkit layout)."""
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

CAMS = ("836212060125", "839512060362")


def _write_scene(root, subj, scene, cams=CAMS, n_frames=1, rng=None,
                 with_mano=False):
    rng = rng or np.random.RandomState(0)
    scene_dir = os.path.join(root, subj, scene)
    meta = {"mano_sides": ["right"], "serials": list(cams),
            "ycb_grasp_ind": 0, "ycb_ids": [5]}
    if with_mano:
        meta["mano_calib"] = ["subject-01"]
    os.makedirs(scene_dir, exist_ok=True)
    with open(os.path.join(scene_dir, "meta.yml"), "w") as f:
        yaml.safe_dump(meta, f)
    import cv2
    for cam in cams:
        cam_dir = os.path.join(scene_dir, cam)
        os.makedirs(cam_dir, exist_ok=True)
        for fi in range(n_frames):
            j3d = rng.randn(21, 3).astype(np.float32) * 0.05 + [0, 0, 0.5]
            pose_y = np.zeros((1, 3, 4), np.float32)
            pose_y[0, :3, :3] = np.eye(3)
            pose_y[0, :3, 3] = [0, 0, 0.5]
            extra = {}
            if with_mano:
                pose_m = np.zeros((1, 51), np.float32)
                pose_m[0, :48] = rng.randn(48) * 0.1
                pose_m[0, 48:] = [0, 0, 0.5]
                extra["pose_m"] = pose_m
            np.savez(os.path.join(cam_dir, f"labels_{fi:06d}.npz"),
                     joint_3d=j3d, pose_y=pose_y, **extra)
            cv2.imwrite(os.path.join(cam_dir, f"color_{fi:06d}.jpg"),
                        (rng.rand(480, 640, 3) * 255).astype(np.uint8))
        # calibration for intrinsics
        calib_dir = os.path.join(root, "calibration", "intrinsics")
        os.makedirs(calib_dir, exist_ok=True)
        with open(os.path.join(calib_dir, f"{cam}_640x480.yml"), "w") as f:
            yaml.safe_dump({"color": {"fx": 615.0, "fy": 615.0,
                                      "ppx": 320.0, "ppy": 240.0}}, f)
    # mano shape calibration
    mano_dir = os.path.join(root, "calibration", "mano_subject-01")
    os.makedirs(mano_dir, exist_ok=True)
    with open(os.path.join(mano_dir, "mano.yml"), "w") as f:
        yaml.safe_dump({"betas": [0.1] * 10}, f)


@pytest.fixture
def dexycb_root(tmp_path):
    root = os.path.join(str(tmp_path), "data", "DexYCB")
    _write_scene(root, "20200709-subject-01", "20200709_000001", n_frames=3,
                 with_mano=True)
    return os.path.join(str(tmp_path), "data")


def test_scan_and_accessors(dexycb_root, monkeypatch):
    monkeypatch.chdir(os.path.dirname(dexycb_root))
    ds = DexYCB(DATA_PRESET=PRESET, DATA_SPLIT="train", DATA_ROOT=dexycb_root,
                SPLIT_MODE="s0", AUG=False, AUG_PARAM=None)
    assert len(ds) == 6  # 3 frames x 2 cameras
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
    # MANO annotations flow through the pipeline
    assert s[Queries.HAND_POSE].shape == (48,)
    assert s[Queries.HAND_SHAPE].shape == (10,)
    assert s[Queries.HAND_VERTS_3D].shape == (778, 3)


def test_mano_accessors(dexycb_root, monkeypatch):
    monkeypatch.chdir(os.path.dirname(dexycb_root))
    ds = DexYCB(DATA_PRESET=PRESET, DATA_SPLIT="train", DATA_ROOT=dexycb_root,
                SPLIT_MODE="s0", AUG=False, AUG_PARAM=None)
    shape = ds.get_hand_shape(0)
    np.testing.assert_allclose(shape, np.full(10, 0.1, np.float32))
    verts = ds.get_hand_verts_3d(0)
    assert verts.shape == (778, 3)
    # pose_m tsl placed the hand at z=0.5
    assert abs(verts[:, 2].mean() - 0.5) < 0.2
    pose = ds.get_hand_pose(0)
    assert pose.shape == (48,)


class TestSplitMatrix:
    """Membership across the toolkit's s0-s3 setups. Fixture: 2 subjects,
    6 scenes each, 2 cameras (serial order sorted ascending like the
    toolkit's _SERIALS constant)."""

    @pytest.fixture
    def matrix_root(self, tmp_path):
        root = os.path.join(str(tmp_path), "data", "DexYCB")
        rng = np.random.RandomState(3)
        for si, subj in enumerate(["20200709-subject-01", "20200813-subject-02"]):
            for seq in range(6):
                _write_scene(root, subj, f"2020{si}_{seq:06d}", rng=rng)
        return os.path.join(str(tmp_path), "data")

    def _mk(self, root, split, mode):
        return DexYCB(DATA_PRESET=PRESET, DATA_SPLIT=split, DATA_ROOT=root,
                      SPLIT_MODE=mode, AUG=False, AUG_PARAM=None)

    def test_s0(self, matrix_root, monkeypatch):
        monkeypatch.chdir(os.path.dirname(matrix_root))
        # train: seq % 5 != 4 -> 5 of 6 scenes, both subjects, 2 cams
        assert len(self._mk(matrix_root, "train", "s0")) == 2 * 5 * 2
        # val: subjects {0,1} (both fixture subjects), seq % 5 == 4
        assert len(self._mk(matrix_root, "val", "s0")) == 2 * 1 * 2
        # test: subjects 2..9 -> none in the 2-subject fixture
        assert len(self._mk(matrix_root, "test", "s0")) == 0

    def test_s1(self, matrix_root, monkeypatch):
        monkeypatch.chdir(os.path.dirname(matrix_root))
        # train subjects {0..5,9}: both fixture subjects
        assert len(self._mk(matrix_root, "train", "s1")) == 2 * 6 * 2
        # val subject {6}, test {7,8}: none here
        assert len(self._mk(matrix_root, "val", "s1")) == 0
        assert len(self._mk(matrix_root, "test", "s1")) == 0

    def test_s2(self, matrix_root, monkeypatch):
        monkeypatch.chdir(os.path.dirname(matrix_root))
        # train serials {0..5}: both fixture cams (idx 0, 1)
        assert len(self._mk(matrix_root, "train", "s2")) == 2 * 6 * 2
        # val serial {6} / test {7}: none here
        assert len(self._mk(matrix_root, "val", "s2")) == 0
        assert len(self._mk(matrix_root, "test", "s2")) == 0

    def test_s3(self, matrix_root, monkeypatch):
        monkeypatch.chdir(os.path.dirname(matrix_root))
        # train: seq//5 not in {3,7,11,15,19} -> all 6 fixture seqs
        # (seq 0-4 -> obj 0, seq 5 -> obj 1)
        assert len(self._mk(matrix_root, "train", "s3")) == 2 * 6 * 2
        assert len(self._mk(matrix_root, "val", "s3")) == 0
        assert len(self._mk(matrix_root, "test", "s3")) == 0
