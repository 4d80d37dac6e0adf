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


def test_render_mesh_overlay_solid_shading(tmp_path):
    """Solid-shaded mesh overlay (VERDICT r3 item 7, replacing the
    reference's OpenDR renders): filled pixels inside the mesh
    silhouette, untouched pixels outside, z-test between two meshes."""
    from PIL import Image

    from artiboost_tpu.viztools import render_mesh_overlay

    H = W = 64
    img = Image.fromarray(np.zeros((H, W, 3), np.uint8))
    intr = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]], np.float32)
    # a near red square (two triangles) occluding a far blue one
    def quad(z, half):
        return np.array([[-half, -half, z], [half, -half, z],
                         [-half, half, z], [half, half, z]], np.float32)

    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    out = render_mesh_overlay(
        img, [(quad(0.5, 0.05), faces, (1.0, 0.0, 0.0)),
              (quad(0.8, 0.12), faces, (0.0, 0.0, 1.0))], intr, alpha=1.0)
    px = np.asarray(out, np.float32) / 255.0
    # center: near RED wins the z-test (solid fill, not wireframe)
    assert px[32, 32, 0] > 0.3 and px[32, 32, 2] < 0.1
    # inside the far quad (|x| < 0.12*100/0.8 = 15px) but outside the
    # near one (|x| < 0.05*100/0.5 = 10px): BLUE
    assert px[32, 45, 2] > 0.3 and px[32, 45, 0] < 0.1
    # outside both: untouched background
    assert px[2, 2].max() == 0.0
    # the overlay writes a file fine
    out.save(str(tmp_path / "overlay.png"))
    assert (tmp_path / "overlay.png").is_file()


def test_draw_batch_solid_meshes(tmp_path):
    """--postprocess_draw with fitted hand verts + predicted box: the
    dumped grid contains solid shaded meshes."""
    class _DrawArg(_Arg):
        submit_dump = False
        postprocess_draw = True
        postprocess_fit_mesh = False
        postprocess_draw_path = None

    from artiboost_tpu.mano.model import get_mano_model
    from artiboost_tpu.submit.epoch_pass import HOSubmitEpochPass

    B = 2
    rng = np.random.RandomState(0)
    arg = _DrawArg()
    arg.postprocess_draw_path = str(tmp_path / "draw")
    pass_ = SubmitEpochPass.build("hodata", arg=arg)
    intr = np.tile(np.array([[435.0, 0, 112], [0, 435.0, 112], [0, 0, 1]],
                            np.float32), (B, 1, 1))
    batch = {"image": np.zeros((B, 224, 224, 3), np.float32) - 0.5,
             "cam_intr": intr}
    mano = get_mano_model()
    hand_verts = np.asarray(mano.v_template) + [0, 0, 0.5]
    preds = {"joints_3d_abs": rng.randn(B, 21, 3).astype(np.float32) * 0.02
             + [0, 0, 0.5],
             "corners_3d_abs": rng.randn(B, 8, 3).astype(np.float32) * 0.03
             + [0.08, 0, 0.5]}
    pass_.draw_batch(0, batch, preds,
                     fitted_verts=np.tile(hand_verts[None], (B, 1, 1)))
    files = os.listdir(arg.postprocess_draw_path)
    assert files == ["eval_batch_0000.png"]
    from PIL import Image
    grid = np.asarray(Image.open(
        os.path.join(arg.postprocess_draw_path, files[0])), np.float32)
    # solid fills cover far more area than skeleton/wireframe lines would
    assert (grid.max(-1) > 20).mean() > 0.02


def test_plot_mesh_3d(tmp_path):
    """3D mesh inspection figure (mayavi-equivalent, reference
    draw.py:236) renders and saves."""
    from artiboost_tpu.mano.model import get_mano_model
    from artiboost_tpu.viztools import plot_mesh_3d

    mano = get_mano_model()
    rng = np.random.RandomState(0)
    out = str(tmp_path / "mesh3d.png")
    plot_mesh_3d(np.asarray(mano.v_template), np.asarray(mano.faces),
                 joints_3d=rng.randn(21, 3).astype(np.float32) * 0.03,
                 corners_3d=rng.randn(8, 3).astype(np.float32) * 0.05,
                 save_path=out)
    assert os.path.getsize(out) > 1000


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
