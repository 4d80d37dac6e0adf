#!/usr/bin/env python
"""Reload a checkpoint and run test-split evaluation / Codalab dump.

Parity: ``train/submit_reload.py`` in the reference.

Usage:
    python train/submit_reload.py --cfg config_eval/eval_ho3dv2_clasbased_artiboost.yaml \
        --reload exp/.../checkpoints/latest --submit_dump [--postprocess_fit_mesh]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import artiboost_tpu.datasets  # noqa: F401  (registers all dataset types)
from artiboost_tpu.criterions import build_criterion
from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.metrics import build_evaluator
from artiboost_tpu.models import build_arch
from artiboost_tpu.opt import build_parser, parse_args
from artiboost_tpu.parallel import build_optimizer, create_train_state, get_mesh, make_eval_step
from artiboost_tpu.submit import SubmitEpochPass
from artiboost_tpu.utils.logger import logger
from artiboost_tpu.utils.recorder import Recorder
from artiboost_tpu.utils.registry import DATASET, build_from_cfg


def _host_loader(dataset, batch_size):
    """Repeat-pads the tail batch for static jit shapes; the attached
    SAMPLE_VALID mask keeps padded rows out of metrics and the dump."""
    from artiboost_tpu.datasets.hodata import padded_host_loader

    yield from padded_host_loader(dataset, batch_size)


def main_worker(arg, cfg, custom):
    recorder = Recorder(arg.exp_id, cfg, eval_only=True)
    data_preset = cfg["DATA_PRESET"]
    batch_size = int(cfg.get("TRAIN", {}).get("BATCH_SIZE", 100))

    test_data = build_from_cfg(cfg["DATASET"]["TEST"], DATASET,
                               {"DATA_PRESET": data_preset})
    arch = build_arch(cfg["ARCH"], data_preset)
    criterion = build_criterion(cfg) if cfg.get("CRITERION") else None
    evaluator = build_evaluator(cfg.get("EVALUATOR", []), data_preset, ARG=arg)

    optimizer, _ = build_optimizer(cfg.get("TRAIN", {"LR": 1e-4}))
    sample = test_data.sample_batch(list(range(min(2, len(test_data)))))
    sample = {k: np.asarray(v) for k, v in sample.items() if not isinstance(v, (str, list))}
    state = create_train_state(arch, optimizer, sample, jax.random.PRNGKey(0))

    reload_path = getattr(arg, "reload", None) or os.path.join(
        arg.resume or "", "checkpoints", "latest")
    if reload_path and os.path.exists(reload_path):
        state, epoch, _ = recorder.resume_checkpoints(state, reload_path)
        logger.info(f"reloaded checkpoint from {reload_path} (epoch {epoch})")
    else:
        # no orbax checkpoint: honor ARCH.PRETRAINED — the released
        # ``.pth.tar`` named by every config_eval/*.yaml is converted to
        # flax variables and loaded (reference train/submit_reload.py:38-48
        # via init_weights; converters in utils/torch_convert.py)
        from artiboost_tpu.utils.pretrained import load_arch_pretrained
        state, loaded = load_arch_pretrained(state, cfg["ARCH"])
        if loaded:
            logger.info("evaluating converted ARCH.PRETRAINED weights")
        else:
            logger.warning(f"no checkpoint at {reload_path} and no loadable "
                           f"ARCH.PRETRAINED; evaluating random init")

    fitting_unit = None
    if arg.postprocess_fit_mesh:
        from artiboost_tpu.postprocess.fitting import FittingUnit
        fitting_unit = FittingUnit(
            ik_mode=getattr(arg, "postprocess_fit_mesh_ik", "iknet"))

    # DP eval over the mesh when the batch tiles the data axis (the
    # reference's batch-100 setting stays single-chip on 8-chip slices)
    mesh = get_mesh(n_data=arg.n_devices)
    if batch_size % mesh.shape["data"] != 0:
        mesh = None
    eval_step = make_eval_step(arch, criterion, mesh)
    pass_ = SubmitEpochPass.build(arg.submit_dataset, arg=arg,
                                  fitting_unit=fitting_unit)
    dump_path = os.path.join(
        recorder.dump_path,
        f"pred_{cfg['DATASET']['TEST'].get('TYPE', 'ho3d').lower()}.json")
    t0 = time.time()
    pass_(0, eval_step, state, _host_loader(test_data, batch_size), evaluator,
          dump_path=dump_path if arg.submit_dump else None)
    logger.info(f"eval pass done in {time.time() - t0:.1f}s")
    measures = recorder.record_evaluator(evaluator, 0, "test")
    logger.info(f"measures: {measures}")
    return measures


def main():
    parser = build_parser()
    parser.add_argument("--reload", type=str, default=None,
                        help="checkpoint path to reload")
    arg, custom = parser.parse_known_args()
    from artiboost_tpu.utils.config import load_config
    cfg = load_config(arg.cfg)
    if arg.batch_size:
        cfg.setdefault("TRAIN", {})["BATCH_SIZE"] = arg.batch_size
    main_worker(arg, cfg, custom)


if __name__ == "__main__":
    main()
