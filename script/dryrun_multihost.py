#!/usr/bin/env python
"""Per-process driver for the 2-process multi-host SPMD dryrun.

Proves SURVEY §2.10's multi-host growth path (VERDICT r4 item 6) on one
machine: each process owns 4 virtual CPU devices; ``init_distributed``
joins them into one 8-device global mesh (collectives ride gloo, the
CPU stand-in for DCN+ICI). The run exercises the synth-only production
path end-to-end: loader construction, the SPMD pose sweep (inputs enter
through ``put_global``), the sharded per-batch render, pipelined mixed
train steps with the psum gradient reduction, a mining reweight, and a
re-prepare — then prints a param hash that MUST match across processes
(SPMD: every process computes the same replicated state or the job is
wrong).

Launched twice (once per rank) by tests/test_multihost.py, or manually:

    python script/dryrun_multihost.py --process_id 0 --num_processes 2 \
        --port 12997 &
    python script/dryrun_multihost.py --process_id 1 --num_processes 2 \
        --port 12997
"""
from __future__ import annotations

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ap = argparse.ArgumentParser()
ap.add_argument("--process_id", type=int, required=True)
ap.add_argument("--num_processes", type=int, default=2)
ap.add_argument("--port", type=int, default=12997)
ap.add_argument("--devices_per_process", type=int, default=4)
arg = ap.parse_args()

flags = os.environ.get("XLA_FLAGS", "")
flags += f" --xla_force_host_platform_device_count={arg.devices_per_process}"
# same rendezvous patience as tests/conftest.py: virtual devices
# time-share one core, starvation is scheduling noise, not deadlock
flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
          " --xla_cpu_collective_call_terminate_timeout_seconds=3600")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_enable_async_dispatch", False)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from artiboost_tpu.parallel import (  # noqa: E402
    build_optimizer,
    create_train_state,
    get_mesh,
    init_distributed,
    make_mixed_train_step,
)
from artiboost_tpu.artiboost import ArtiBoostLoader  # noqa: E402
from artiboost_tpu.criterions import build_criterion  # noqa: E402
from artiboost_tpu.models import build_arch  # noqa: E402

B = 8

DATA_PRESET = {
    "USE_CACHE": False, "FILTER_NO_CONTACT": False, "FILTER_THRESH": 0.0,
    "BBOX_EXPAND_RATIO": 1.2, "FULL_IMAGE": False,
    "IMAGE_SIZE": [64, 64], "HEATMAP_SIZE": [8, 8],
    "CENTER_IDX": 0, "CROP_MODEL": "root_obj",
}
MANAGER = {
    "DATA_PRESET": DATA_PRESET,
    "SYNTH_FACTOR": 1.0, "CONFIG_LEN_TRAIN": 16, "VAL_LEN": 0,
    "OBJ_ENGINE": {"OBJ": ["synthobj_0", "synthobj_1"],
                   "OBJ_ORIGIN_DATASET": "HO3D"},
    "VIEW_ENGINE": {"PERSP_U_BINS": 2, "PERSP_THETA_BINS": 4,
                    "CAMERA_Z_RANGE": [0.45, 0.55]},
    "GRASP_ENGINE": {"GRASP_NUM": 4},
    "FILTER": {"BACK": False},
    "UPDATE_METHOD": "method_1",
    "SCRAMBLER": {"TYPE": "random", "HAND_TSL_SIGMA": 0.01,
                  "HAND_POSE_SIGMA": 0.1},
    "REFINER": {"TYPE": "null"},
    "RENDERER": {"RENDER_SIZE": [96, 96],
                 "CAM_PARAM": {"FX": 200.0, "FY": 200.0,
                               "CX": 48.0, "CY": 48.0}},
}
ARCH = {
    "TYPE": "HybridBaseline", "PRETRAINED": "",
    "BACKBONE": {"TYPE": "ResNet18", "PRETRAINED": False},
    "HYBRID_HEAD": {"TYPE": "IntegralDeconvHead", "NCLASSES": 22,
                    "DECONV_WITH_BIAS": False, "NORM_TYPE": "softmax",
                    "INPUT_CHANNEL": 512, "DEPTH_RESOLUTION": 8,
                    "NUM_DECONV_LAYERS": 2,
                    "NUM_DECONV_FILTERS": [64, 64],
                    "NUM_DECONV_KERNELS": [4, 4], "FINAL_CONV_KERNEL": 1},
    "BOX_HEAD": {"TYPE": "MLP_O", "LAYERS_N": [128, 64], "OUT_CHANNEL": 6},
    "PREVIOUS": [],
}
CFG = {
    "DATA_PRESET": DATA_PRESET,
    "ARCH": ARCH,
    "LAMBDAS": [1.0],
    "CRITERION": [{"TYPE": "JointsLoss", "LAMBDA_JOINTS_3D": 1.0,
                   "LAMBDA_CORNERS_3D": 0.2}],
    "TRAIN": {"BATCH_SIZE": B, "LR": 1e-3, "OPTIMIZER": "adam",
              "WEIGHT_DECAY": 0.0, "GRAD_CLIP": 1.0,
              "LR_DECAY_STEP": 100, "LR_DECAY_GAMMA": 1.0},
}


def main():
    init_distributed(f"localhost:{arg.port}", arg.num_processes,
                     arg.process_id)
    n_global = arg.num_processes * arg.devices_per_process
    assert len(jax.devices()) == n_global, jax.devices()
    assert jax.process_count() == arg.num_processes
    mesh = get_mesh()

    loader = ArtiBoostLoader(real_dataset=None, cfg=MANAGER, batch_size=B,
                             n_epochs=4, seed=5, mesh=mesh)
    loader.prepare()

    arch = build_arch(CFG["ARCH"], DATA_PRESET)
    criterion = build_criterion(CFG)
    optimizer, _ = build_optimizer(CFG["TRAIN"])

    # init from host zeros of the synth batch's schema (eager ops on
    # global arrays are illegal — same pattern as train_artiboost.py)
    perm = np.arange(16)
    sidx = loader._sample_synth_idx(perm, 0, B)
    synth = loader._synth_batch_jit(jax.random.PRNGKey(0), loader.generated,
                                    sidx)
    init_host = jax.tree_util.tree_map(lambda x: np.zeros(x.shape, x.dtype),
                                       synth)
    state = create_train_state(arch, optimizer, init_host,
                               jax.random.PRNGKey(1), mesh=mesh)

    step = make_mixed_train_step(arch, criterion, optimizer, mesh)
    loss = None
    for r in range(2):
        sidx = loader._sample_synth_idx(perm, r, B)
        synth = loader._synth_batch_jit(jax.random.fold_in(
            jax.random.PRNGKey(2), r), loader.generated, sidx)
        state, _, losses, _ = step(state, {}, synth, jax.random.PRNGKey(3 + r))
        loss = float(losses["final_loss"])  # replicated -> fetchable

    # mining reweight from host-built val maps (identical on every
    # process), then a re-prepare + one more step through the new draw
    shape = loader.ccv.shape
    rs = np.random.RandomState(11)
    val_map = rs.rand(*shape).astype(np.float32) * 50.0
    seen = rs.rand(*shape) > 0.5
    loader.sample_reweight(jnp.asarray(val_map), jnp.asarray(seen),
                           epoch_idx=1)
    loader.prepare()
    sidx = loader._sample_synth_idx(perm, 3, B)
    synth = loader._synth_batch_jit(jax.random.PRNGKey(7), loader.generated,
                                    sidx)
    state, _, losses, _ = step(state, {}, synth, jax.random.PRNGKey(8))
    loss2 = float(losses["final_loss"])

    h = hashlib.md5()
    for leaf in jax.tree_util.tree_leaves(state.params):
        h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
    w = np.asarray(loader.ccv.sample_weight_map)
    h.update(np.ascontiguousarray(w).tobytes())
    print(f"MULTIHOST_OK proc={jax.process_index()} loss1={loss:.6f} "
          f"loss2={loss2:.6f} hash={h.hexdigest()}", flush=True)


if __name__ == "__main__":
    main()
