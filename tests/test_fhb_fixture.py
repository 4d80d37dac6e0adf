"""FPHB loader against a synthetic on-disk fixture (parity:
``anakin/datasets/fhb.py`` — subject split, skeleton reorder, cam-extr
world->camera mapping, mm->m)."""
import os

import numpy as np
import pytest

from artiboost_tpu.datasets.fhb import FPHB
from artiboost_tpu.datasets.hoquery import Queries

PRESET = {
    "USE_CACHE": False, "BBOX_EXPAND_RATIO": 1.2, "IMAGE_SIZE": [64, 64],
    "CENTER_IDX": 0, "CROP_MODEL": "root_obj",
}


def _write_seq(root, subj, action, seq="1", n=2, rng=None):
    rng = rng or np.random.RandomState(0)
    skel_dir = os.path.join(root, "Hand_pose_annotation_v1", subj, action, seq)
    obj_dir = os.path.join(root, "Object_6D_pose_annotation_v1_1", subj, action, seq)
    vid_dir = os.path.join(root, "Video_files", subj, action, seq, "color")
    for d in (skel_dir, obj_dir, vid_dir):
        os.makedirs(d, exist_ok=True)
    skel = np.concatenate(
        [np.arange(n)[:, None],
         rng.randn(n, 63) * 20 + 400], axis=1)  # mm world coords
    np.savetxt(os.path.join(skel_dir, "skeleton.txt"), skel)
    poses = []
    for fi in range(n):
        T = np.eye(4)
        T[:3, 3] = [100, 50, 400]  # mm
        poses.append(np.concatenate([[fi], T.T.ravel()]))
    np.savetxt(os.path.join(obj_dir, "object_pose.txt"), np.asarray(poses))
    import cv2
    for fi in range(n):
        cv2.imwrite(os.path.join(vid_dir, f"color_{fi:04d}.jpeg"),
                    (rng.rand(270, 480, 3) * 255).astype(np.uint8))


@pytest.fixture
def fhb_root(tmp_path):
    root = os.path.join(str(tmp_path), "data", "fhbhands")
    _write_seq(root, "Subject_1", "open_milk", n=3)   # train subject
    _write_seq(root, "Subject_2", "pour_juice_bottle", n=2)  # test subject
    return os.path.join(str(tmp_path), "data")


def test_subject_split_and_accessors(fhb_root):
    train = FPHB(DATA_PRESET=PRESET, DATA_SPLIT="train", DATA_ROOT=fhb_root,
                 AUG=False, AUG_PARAM=None)
    test = FPHB(DATA_PRESET=PRESET, DATA_SPLIT="test", DATA_ROOT=fhb_root,
                AUG=False, AUG_PARAM=None)
    assert len(train) == 3 and len(test) == 2
    assert train.get_obj_idx(0) == 3  # milk
    assert test.get_obj_idx(0) == 1   # juice_bottle
    j = train.get_joints_3d(0)
    assert j.shape == (21, 3)
    assert np.abs(j).max() < 2.0  # meters, not mm
    t = train.get_obj_transf(0)
    assert np.abs(t[:3, 3]).max() < 1.0


def test_action_split(fhb_root):
    import os as _os
    split_file = _os.path.join(fhb_root, "fhbhands",
                               "data_split_action_recognition.txt")
    with open(split_file, "w") as f:
        f.write("Training 1\n")
        f.write("Subject_1/open_milk/1 0\n")
        f.write("Test 1\n")
        f.write("Subject_2/pour_juice_bottle/1 5\n")
    train = FPHB(DATA_PRESET=PRESET, DATA_SPLIT="train", DATA_ROOT=fhb_root,
                 SPLIT_MODE="actions", AUG=False, AUG_PARAM=None)
    test = FPHB(DATA_PRESET=PRESET, DATA_SPLIT="test", DATA_ROOT=fhb_root,
                SPLIT_MODE="actions", AUG=False, AUG_PARAM=None)
    assert len(train) == 3 and len(test) == 2
