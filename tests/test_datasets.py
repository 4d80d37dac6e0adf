import numpy as np
import pytest

from artiboost_tpu.datasets.hodata import ho_collate
from artiboost_tpu.datasets.hoquery import Queries, SynthQueries
from artiboost_tpu.datasets.synthetic import SyntheticHO

PRESET = {
    "IMAGE_SIZE": [128, 128],
    "USE_CACHE": False,
    "FILTER_NO_CONTACT": False,
    "FILTER_THRESH": 0.0,
    "BBOX_EXPAND_RATIO": 1.2,
    "FULL_IMAGE": False,
    "CENTER_IDX": 9,
    "CROP_MODEL": "root_obj",
}


@pytest.fixture(scope="module")
def dataset():
    return SyntheticHO(
        DATA_PRESET=PRESET, DATA_SPLIT="train", AUG=True,
        AUG_PARAM={"SCALE_JIT": 0.1, "CENTER_JIT": 0.1, "MAX_ROT": 0.2},
        N_SAMPLES=16, RAW_SIZE=256,
    )


class TestSyntheticDataset:
    def test_len_and_sample_schema(self, dataset):
        assert len(dataset) == 16
        s = dataset[0]
        assert s[Queries.IMAGE].shape == (128, 128, 3)
        assert s[Queries.JOINTS_3D].shape == (21, 3)
        assert s[Queries.CORNERS_3D].shape == (8, 3)
        assert s[Queries.CAM_INTR].shape == (3, 3)
        assert s[Queries.OBJ_TRANSF].shape == (4, 4)
        assert s[SynthQueries.IS_SYNTH] == 0

    def test_root_relative(self, dataset):
        s = dataset[1]
        np.testing.assert_allclose(s[Queries.JOINTS_3D][9], 0.0, atol=1e-6)

    def test_2d_3d_consistency(self, dataset):
        """Projecting (root-relative + root) with the updated intrinsics
        must reproduce the stored 2D keypoints."""
        s = dataset[2]
        j3d = s[Queries.JOINTS_3D] + s[Queries.ROOT_JOINT]
        hom = (s[Queries.CAM_INTR] @ j3d.T).T
        j2d = hom[:, :2] / hom[:, 2:]
        np.testing.assert_allclose(j2d, s[Queries.JOINTS_2D], atol=0.5)

    def test_obj_transf_consistency(self, dataset):
        """corners_3d == OBJ_TRANSF applied to corners_can."""
        s = dataset[3]
        T = s[Queries.OBJ_TRANSF]
        expect = s[Queries.CORNERS_CAN] @ T[:3, :3].T + T[:3, 3]
        got = s[Queries.CORNERS_3D] + s[Queries.ROOT_JOINT]
        np.testing.assert_allclose(got, expect, atol=1e-4)

    def test_image_content(self, dataset):
        s = dataset[4]
        img = s[Queries.IMAGE] + 0.5
        assert img.min() >= -1e-5 and img.max() <= 1.0 + 1e-5
        assert img.std() > 0.02  # has actual content

    def test_sample_batch(self, dataset):
        batch = dataset.sample_batch([0, 1, 2, 3])
        assert batch[Queries.IMAGE].shape == (4, 128, 128, 3)
        assert batch[Queries.PADDING_MASK].shape[0] == 4
        assert batch[Queries.OBJ_VERTS_CAN].shape[0] == 4

    def test_no_aug_deterministic(self):
        d1 = SyntheticHO(DATA_PRESET=PRESET, DATA_SPLIT="test", AUG=False,
                         AUG_PARAM=None, N_SAMPLES=4, RAW_SIZE=256)
        s_a, s_b = d1[0], d1[0]
        np.testing.assert_allclose(s_a[Queries.IMAGE], s_b[Queries.IMAGE])
        # eval split: all keypoints marked visible
        assert s_a[Queries.JOINTS_VIS].sum() == 21


class TestCollate:
    def test_padding_mask(self):
        s1 = {Queries.OBJ_VERTS_CAN: np.zeros((10, 3)), "x": np.ones(3)}
        s2 = {Queries.OBJ_VERTS_CAN: np.zeros((6, 3)), "x": np.ones(3)}
        out = ho_collate([s1, s2])
        assert out[Queries.OBJ_VERTS_CAN].shape == (2, 10, 3)
        np.testing.assert_allclose(out[Queries.PADDING_MASK][0], 1.0)
        assert out[Queries.PADDING_MASK][1].sum() == 6


class TestDexYCBFilter:
    """Contact / invisible-hand frame filtering (dexycb.py:83-105 parity)."""

    def _make(self, tmp_path, joint_center, obj_tsl):
        import os
        from artiboost_tpu.datasets.dexycb import DexYCB

        lab = os.path.join(str(tmp_path), "labels_000001.npz")
        j3d = np.full((21, 3), joint_center, np.float32)
        pose_y = np.zeros((1, 3, 4), np.float32)
        pose_y[0, :3, :3] = np.eye(3)
        pose_y[0, :3, 3] = obj_tsl
        np.savez(lab, joint_3d=j3d, pose_y=pose_y)

        ds = object.__new__(DexYCB)
        ds.name = "DexYCB"
        ds.filter_invisible_hand = True
        ds.filter_no_contact = True
        ds.filter_thresh = 50.0  # mm
        ds._corner_cache = {1: np.zeros((8, 3), np.float32)}
        ds.samples = [{"labels": lab, "ycb_grasp_ind": 0, "ycb_ids": [1]}]
        return ds

    def test_keeps_contact_frame(self, tmp_path):
        ds = self._make(tmp_path, joint_center=0.51, obj_tsl=(0.51, 0.51, 0.51))
        ds._filter_samples()
        assert len(ds.samples) == 1

    def test_drops_no_contact_frame(self, tmp_path):
        ds = self._make(tmp_path, joint_center=0.5, obj_tsl=(0.7, 0.5, 0.5))
        ds._filter_samples()
        assert len(ds.samples) == 0

    def test_drops_invisible_hand(self, tmp_path):
        ds = self._make(tmp_path, joint_center=-1.0, obj_tsl=(-1.0, -1.0, -1.0))
        ds._filter_samples()
        assert len(ds.samples) == 0
