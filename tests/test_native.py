"""Native hostops library vs the cv2/numpy reference path."""
import numpy as np
import pytest

from artiboost_tpu import native
from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.datasets.synthetic import SyntheticHO

PRESET = {
    "IMAGE_SIZE": [96, 96], "USE_CACHE": False, "FILTER_NO_CONTACT": False,
    "FILTER_THRESH": 0.0, "BBOX_EXPAND_RATIO": 1.2, "FULL_IMAGE": False,
    "CENTER_IDX": 9, "CROP_MODEL": "root_obj",
}


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native hostops library not built")
    return True


class TestWarpAffineBatch:
    def test_identity_warp(self, lib_ok, rng):
        img = (rng.rand(2, 32, 32, 3) * 255).astype(np.uint8)
        inv = np.tile(np.array([[1, 0, 0], [0, 1, 0]], np.float32), (2, 1, 1))
        jit = np.tile([1.0, 1.0, 1.0, 0.0], (2, 1)).astype(np.float32)
        out = native.warp_affine_batch(img, inv, jit, 32, 32)
        np.testing.assert_allclose(out, img.astype(np.float32) / 255.0 - 0.5, atol=1e-3)

    def test_matches_cv2_warp(self, lib_ok, rng):
        import cv2

        img = (rng.rand(1, 64, 64, 3) * 255).astype(np.uint8)
        # random affine: scale + translate + small rotation
        a = 0.1
        M = np.array([[1.4 * np.cos(a), -1.4 * np.sin(a), 5.0],
                      [1.4 * np.sin(a), 1.4 * np.cos(a), -3.0],
                      [0, 0, 1]], np.float32)
        inv = np.linalg.inv(M)[:2][None]
        jit = np.array([[1.0, 1.0, 1.0, 0.0]], np.float32)
        out = native.warp_affine_batch(img, inv, jit, 48, 48)[0]
        ref = cv2.warpAffine(img[0].astype(np.float32) / 255.0, M[:2], (48, 48),
                             flags=cv2.INTER_LINEAR) - 0.5
        # interiors must match; borders may differ by sampling convention
        diff = np.abs(out[2:-2, 2:-2] - ref[2:-2, 2:-2])
        assert np.quantile(diff, 0.99) < 0.02

    def test_brightness_jitter(self, lib_ok, rng):
        img = np.full((1, 16, 16, 3), 128, np.uint8)
        inv = np.array([[[1, 0, 0], [0, 1, 0]]], np.float32)
        out_dim = native.warp_affine_batch(
            img, inv, np.array([[0.5, 1.0, 1.0, 0.0]], np.float32), 16, 16)
        out_full = native.warp_affine_batch(
            img, inv, np.array([[1.0, 1.0, 1.0, 0.0]], np.float32), 16, 16)
        assert out_dim.mean() < out_full.mean() - 0.1


class TestNativeBatchPath:
    def test_native_matches_python_batch(self, lib_ok):
        """sample_batch via native C++ must match the per-sample python
        path for a no-aug dataset (identical geometry, same pixels)."""
        ds = SyntheticHO(DATA_PRESET=PRESET, DATA_SPLIT="test", AUG=False,
                         AUG_PARAM=None, N_SAMPLES=8, RAW_SIZE=128)
        b_py = ds.sample_batch([0, 1, 2, 3], use_native=False)
        b_nat = ds.sample_batch([0, 1, 2, 3], use_native=True)
        assert set(b_py.keys()) == set(b_nat.keys())
        for k in b_py:
            if k == Queries.IMAGE:
                continue
            np.testing.assert_allclose(b_py[k], b_nat[k], atol=1e-5, err_msg=k)
        diff = np.abs(b_py[Queries.IMAGE] - b_nat[Queries.IMAGE])
        assert np.quantile(diff, 0.99) < 0.03
