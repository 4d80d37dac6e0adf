"""Eval-parity dress rehearsal to submission-file fidelity (VERDICT r3
item 4): build a reference-named ``.pth.tar`` from the torch twin, run
the FULL ``train/submit_reload.py`` path on a fixture test set, and
byte-compare the Codalab JSON + zip against a dump produced by the
REFERENCE's own dump logic (transcribed verbatim from
``anakin/submit/hodata_submit_epoch_pass.py:28-56,129-156``) executed
host-side on the same predictions — identical joint order, axis flips,
rounding, and archive layout.
"""
import json
import os
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from artiboost_tpu.models import build_arch
from artiboost_tpu.parallel import build_optimizer, create_train_state, make_eval_step
from artiboost_tpu.utils.config import load_config
from artiboost_tpu.utils.pretrained import load_arch_pretrained
from artiboost_tpu.utils.transform import MANO_TO_OPENPOSE_ORDER

CFG_EVAL = os.path.join(os.path.dirname(__file__), "..", "config_eval",
                        "eval_ho3dv2_clasbased_artiboost.yaml")


# ---- the REFERENCE's dump pipeline, transcribed 1:1 (behavioral spec
# from anakin/submit/hodata_submit_epoch_pass.py; do not "improve") ----
REF_REORDER_IDXS = [0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11,
                    12, 19, 7, 8, 9, 20]


def reference_collect(pred_joints_batches):
    """:129-156 — per batch: joints[:, unorder]; x = -x; entries = -row."""
    unorder_idxs = np.argsort(REF_REORDER_IDXS)
    res_joints, res_verts = [], []
    for pred_joints in pred_joints_batches:
        pj = pred_joints[:, unorder_idxs].copy()
        pj[:, :, 0] = -pj[:, :, 0]
        joints = [-val for val in pj]
        res_joints.extend(joints)
        res_verts.extend([np.zeros((778, 3))] * len(joints))
    return res_joints, res_verts


def reference_dump_json(pred_out_path, xyz_pred_list, verts_pred_list):
    """:34-56 — roundall to 5 decimals, json [xyz, verts], zip -j."""

    def roundall(rows):
        return [[round(val, 5) for val in row] for row in rows]

    xyz_pred_list = [roundall(x.tolist()) for x in xyz_pred_list]
    verts_pred_list = [roundall(x.tolist()) for x in verts_pred_list]
    with open(pred_out_path, "w") as fo:
        json.dump([xyz_pred_list, verts_pred_list], fo)
    zipped_path = pred_out_path.replace(".json", ".zip")
    # `zip -j` semantics: archive member is the basename, deflated
    with zipfile.ZipFile(zipped_path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.write(pred_out_path, os.path.basename(pred_out_path))
    return zipped_path


def test_joint_order_constant_matches_reference():
    assert list(MANO_TO_OPENPOSE_ORDER) == REF_REORDER_IDXS


def test_fitted_verts_dumped_raw_like_reference(tmp_path):
    """Parity quirk: the reference appends fitted verts RAW (camera
    frame, hodata_submit_epoch_pass.py:148-149) while its joints get the
    (x,-y,-z) Codalab flip — the dump must reproduce that asymmetry."""
    from artiboost_tpu.submit.epoch_pass import SubmitEpochPass

    class _FitArg:
        submit_dump = True
        postprocess_fit_mesh = True
        postprocess_fit_mesh_use_fitted_joints = False
        postprocess_draw = False
        postprocess_draw_path = None

    B = 3
    rng = np.random.RandomState(0)
    joints = rng.randn(B, 21, 3).astype(np.float32)
    verts = rng.randn(B, 778, 3).astype(np.float32)

    class _StubFit:
        def __call__(self, pred_joints, batch):
            return {"hand_verts": verts, "joints": joints}

    def eval_step(state, b, key):
        return {"joints_3d_abs": joints}, {}

    pass_ = SubmitEpochPass.build("hodata", arg=_FitArg(),
                                  fitting_unit=_StubFit())
    dump = str(tmp_path / "pred.json")
    from artiboost_tpu.metrics.evaluator import build_evaluator
    pass_(0, eval_step, state=None,
          data_loader=[{"image": np.zeros((B, 8, 8, 3), np.float32)}],
          evaluator=build_evaluator([], {}), dump_path=dump)
    with open(dump) as f:
        xyz, vv = json.load(f)
    # joints flipped (x, -y, -z) in unordered order; verts RAW
    unorder = np.argsort(REF_REORDER_IDXS)
    want_j = joints[:, unorder] * np.asarray([1.0, -1.0, -1.0])
    np.testing.assert_allclose(np.asarray(xyz), want_j, atol=1e-4)
    np.testing.assert_allclose(np.asarray(vv), verts, atol=1e-4)


class _Arg:
    exp_id = "smoke"
    resume = None
    reload = None
    submit_dataset = "hodata"
    submit_dump = True
    postprocess_fit_mesh = False
    postprocess_fit_mesh_use_fitted_joints = False
    postprocess_draw = False
    postprocess_draw_path = None
    n_devices = 1
    batch_size = None
    filter_unseen_obj_idxs = []


@pytest.mark.slow
def test_submit_reload_dress_rehearsal(tmp_path, monkeypatch):
    from test_full_parity import HYBRID_ARCH, _randomize_bn, _TorchHybrid

    from train.submit_reload import main_worker

    # 1. reference-named checkpoint from the torch twin
    torch.manual_seed(3)
    tm = _TorchHybrid().eval()
    _randomize_bn(tm)
    sd = {f"module.{k}": v for k, v in tm.state_dict().items()
          if "num_batches_tracked" not in k}  # DataParallel-style names
    ckpt_dir = tmp_path / "checkpoints"
    ckpt_dir.mkdir()
    ckpt = ckpt_dir / "artiboost_ho3dv2_clasbased_100e.pth.tar"
    torch.save({"state_dict": sd}, str(ckpt))

    # 2. the released eval config, with the fixture dataset standing in
    # for HO3D (absent here) and the twin checkpoint as ARCH.PRETRAINED
    cfg = load_config(CFG_EVAL)
    cfg["DATASET"]["TEST"] = {"TYPE": "SyntheticHO", "DATA_SPLIT": "test",
                              "AUG": False, "AUG_PARAM": None,
                              "N_SAMPLES": 12, "SEED": 11, "RAW_SIZE": 256}
    cfg["ARCH"] = dict(HYBRID_ARCH)
    cfg["ARCH"]["PRETRAINED"] = str(ckpt)
    cfg["TRAIN"]["BATCH_SIZE"] = 8  # 12 samples -> padded tail batch
    monkeypatch.chdir(tmp_path)
    main_worker(_Arg(), cfg, None)

    exps = [d for d in os.listdir(tmp_path / "exp") if d.startswith("eval_")]
    assert len(exps) == 1
    dump = tmp_path / "exp" / exps[0] / "pred_syntheticho.json"
    assert dump.is_file() and dump.with_suffix(".zip").is_file()

    # 3. the SAME predictions, host-side: identical eval_step jit on the
    # identical padded loader order -> bitwise-identical joints
    from artiboost_tpu.datasets.hodata import padded_host_loader
    from artiboost_tpu.datasets.hoquery import Queries
    from artiboost_tpu.utils.registry import DATASET, build_from_cfg

    test_data = build_from_cfg(cfg["DATASET"]["TEST"], DATASET,
                               {"DATA_PRESET": cfg["DATA_PRESET"]})
    arch = build_arch(cfg["ARCH"], cfg["DATA_PRESET"])
    optimizer, _ = build_optimizer(cfg["TRAIN"])
    sample = test_data.sample_batch([0, 1])
    sample = {k: np.asarray(v) for k, v in sample.items()
              if not isinstance(v, (str, list))}
    state = create_train_state(arch, optimizer, sample, jax.random.PRNGKey(0))
    state, loaded = load_arch_pretrained(state, cfg["ARCH"])
    assert loaded
    eval_step = make_eval_step(arch, None, None)
    batches = []
    for batch in padded_host_loader(test_data, 8):
        b = {k: jnp.asarray(v) for k, v in batch.items()
             if not isinstance(v, (str, list))}
        preds, _ = eval_step(state, b, jax.random.PRNGKey(0))
        pj = np.asarray(preds["joints_3d_abs"])
        if Queries.SAMPLE_VALID in batch:
            pj = pj[:int(np.asarray(batch[Queries.SAMPLE_VALID]).sum())]
        batches.append(pj)
    assert sum(b.shape[0] for b in batches) == 12

    # 4. reference logic on those predictions -> byte-identical files
    xyz, verts = reference_collect(batches)
    ref_json = str(tmp_path / "pred_syntheticho.json")  # same basename
    ref_zip = reference_dump_json(ref_json, xyz, verts)

    ours = dump.read_bytes()
    refs = open(ref_json, "rb").read()
    assert ours == refs, (
        "submit JSON differs from the reference dump logic on identical "
        "predictions (joint order / flips / rounding / serialization)")

    # archive layout: one member, basename arcname, deflated
    with zipfile.ZipFile(dump.with_suffix(".zip")) as zf_ours, \
            zipfile.ZipFile(ref_zip) as zf_ref:
        assert zf_ours.namelist() == zf_ref.namelist() == ["pred_syntheticho.json"]
        oi = zf_ours.infolist()[0]
        ri = zf_ref.infolist()[0]
        assert oi.compress_type == ri.compress_type == zipfile.ZIP_DEFLATED
        assert zf_ours.read(oi.filename) == zf_ref.read(ri.filename)
