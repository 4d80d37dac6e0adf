"""Codalab submission dump: JSON structure, joint reorder + axis flips,
zip packaging (parity: hodata_submit_epoch_pass.py:34-56,129-145)."""
import json
import os
import zipfile

import jax
import numpy as np

from artiboost_tpu.metrics.evaluator import build_evaluator
from artiboost_tpu.submit.epoch_pass import SubmitEpochPass
from artiboost_tpu.utils.transform import MANO_TO_OPENPOSE_ORDER


class _Arg:
    submit_dump = True
    postprocess_fit_mesh = False
    postprocess_fit_mesh_use_fitted_joints = False


def test_dump_json_and_flips(tmp_path):
    B = 4
    rng = np.random.RandomState(0)
    joints = rng.randn(B, 21, 3).astype(np.float32)
    batch = {"image": np.zeros((B, 8, 8, 3), np.float32)}

    def eval_step(state, b, key):
        return {"joints_3d_abs": joints}, {}

    pass_ = SubmitEpochPass.build("hodata", arg=_Arg())
    evaluator = build_evaluator([], {})
    dump = str(tmp_path / "pred_ho3d.json")
    pass_(0, eval_step, state=None, data_loader=[batch], evaluator=evaluator,
          dump_path=dump)

    assert os.path.isfile(dump)
    assert os.path.isfile(dump.replace(".json", ".zip"))
    with open(dump) as f:
        xyz, verts = json.load(f)
    assert len(xyz) == B and len(verts) == B
    assert len(xyz[0]) == 21 and len(xyz[0][0]) == 3
    assert len(verts[0]) == 778

    # joint 0 (wrist maps to itself in both orders): codalab = (x, -y, -z)
    reorder = list(MANO_TO_OPENPOSE_ORDER)
    unorder = np.argsort(reorder)
    expect = joints[:, unorder].copy()
    got = np.asarray(xyz[0])
    np.testing.assert_allclose(got[:, 0], expect[0, :, 0], atol=1e-4)
    np.testing.assert_allclose(got[:, 1], -expect[0, :, 1], atol=1e-4)
    np.testing.assert_allclose(got[:, 2], -expect[0, :, 2], atol=1e-4)

    with zipfile.ZipFile(dump.replace(".json", ".zip")) as zf:
        assert zf.namelist() == ["pred_ho3d.json"]


def test_dump_trims_padded_tail(tmp_path):
    """A repeat-padded final batch (SAMPLE_VALID mask) must dump exactly
    the true number of samples — Codalab rejects wrong-length files."""
    B, n_valid_tail = 4, 2
    rng = np.random.RandomState(1)

    def eval_step(state, b, key):
        return {"joints_3d_abs": rng.randn(B, 21, 3).astype(np.float32)}, {}

    full = {"image": np.zeros((B, 8, 8, 3), np.float32)}
    tail = {"image": np.zeros((B, 8, 8, 3), np.float32),
            "sample_valid": np.array([1, 1, 0, 0], np.float32)}
    pass_ = SubmitEpochPass.build("hodata", arg=_Arg())
    dump = str(tmp_path / "pred_ho3d.json")
    pass_(0, eval_step, state=None, data_loader=[full, tail],
          evaluator=build_evaluator([], {}), dump_path=dump)
    with open(dump) as f:
        xyz, verts = json.load(f)
    assert len(xyz) == B + n_valid_tail
    assert len(verts) == B + n_valid_tail


def test_padded_host_loader_covers_every_sample():
    """Loader yields ceil(n/bs) static-shape batches; only the tail batch
    carries SAMPLE_VALID, and the valid rows cover the dataset exactly."""
    from artiboost_tpu.datasets.hodata import padded_host_loader
    from artiboost_tpu.datasets.hoquery import Queries

    class _DS:
        def __len__(self):
            return 10

        def sample_batch(self, idx):
            return {"idx": np.asarray(idx, np.int64)}

    batches = list(padded_host_loader(_DS(), 4))
    assert len(batches) == 3
    assert all(b["idx"].shape == (4,) for b in batches)
    assert Queries.SAMPLE_VALID not in batches[0]
    assert Queries.SAMPLE_VALID not in batches[1]
    valid = batches[2][Queries.SAMPLE_VALID]
    np.testing.assert_array_equal(valid, [1, 1, 0, 0])
    seen = np.concatenate([batches[0]["idx"], batches[1]["idx"],
                           batches[2]["idx"][:2]])
    np.testing.assert_array_equal(np.sort(seen), np.arange(10))


def test_draw_batch(tmp_path):
    class _DrawArg(_Arg):
        submit_dump = False
        postprocess_draw = True
        postprocess_draw_path = None

    B = 4
    rng = np.random.RandomState(0)
    arg = _DrawArg()
    arg.postprocess_draw_path = str(tmp_path / "draw")
    pass_ = SubmitEpochPass.build("hodata", arg=arg)
    intr = np.tile(np.array([[435.0, 0, 112], [0, 435.0, 112], [0, 0, 1]],
                            np.float32), (B, 1, 1))
    batch = {"image": rng.rand(B, 224, 224, 3).astype(np.float32) - 0.5,
             "cam_intr": intr}

    def eval_step(state, b, key):
        return {"joints_3d_abs": rng.randn(B, 21, 3).astype(np.float32) * 0.05
                + [0, 0, 0.5],
                "corners_3d_abs": rng.randn(B, 8, 3).astype(np.float32) * 0.05
                + [0, 0, 0.5]}, {}

    from artiboost_tpu.metrics.evaluator import build_evaluator
    pass_(0, eval_step, state=None, data_loader=[batch],
          evaluator=build_evaluator([], {}))
    import os
    files = os.listdir(arg.postprocess_draw_path)
    assert files == ["eval_batch_0000.png"]
