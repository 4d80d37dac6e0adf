"""Global argparse + config merge (parity: ``anakin/opt.py``).

Same flag surface; ``--gpu_id``/render-GPU flags become no-ops on TPU
(device selection is mesh-driven), kept for CLI compatibility.
"""
from __future__ import annotations

import argparse
import os
from typing import Tuple

from artiboost_tpu.utils.config import load_config
from artiboost_tpu.utils.logger import logger


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="ArtiBoost-TPU")
    parser.add_argument("--vis_toc", type=float, default=5)
    # experiment
    parser.add_argument("--cfg", help="experiment config file", type=str, default=None)
    parser.add_argument("--exp_id", default="default", type=str)
    parser.add_argument("--resume", help="resume training from exp dir", type=str, default=None)
    parser.add_argument("--allow_dirty", action="store_true",
                        help="record a NAMED experiment from a dirty git tree "
                             "(refused by default for reproducibility)")
    parser.add_argument("--multihost", action="store_true",
                        help="join a multi-process SPMD job "
                             "(jax.distributed.initialize; the mesh then "
                             "spans all hosts' devices)")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="multihost coordinator host:port (omit on TPU "
                             "pods — autodetected from the pod metadata)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--workers", help="host data worker threads", type=int, default=20)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--evaluate", action="store_true")
    # general
    parser.add_argument("--gpu_id", type=str, default=None,
                        help="compat no-op (TPU mesh replaces device picking)")
    parser.add_argument("--snapshot", default=50, type=int)
    parser.add_argument("--test_freq", type=int, default=5)
    parser.add_argument("--n_devices", type=int, default=None,
                        help="mesh data-axis size (default: all local devices)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="write a jax.profiler trace (TensorBoard/Perfetto) here")
    parser.add_argument("--profile_steps", type=int, default=20,
                        help="number of train steps to capture in the trace")
    # submit
    parser.add_argument("--resume_epoch", type=int, default=0)
    parser.add_argument("--submit_dataset", type=str, default="hodata")
    parser.add_argument("--filter_unseen_obj_idxs", type=int, nargs="+", default=[])
    parser.add_argument("--true_root", action="store_true")
    parser.add_argument("--true_bone_scale", action="store_true")
    parser.add_argument("--submit_dump", action="store_true")
    parser.add_argument("--postprocess_fit_mesh", action="store_true")
    parser.add_argument("--postprocess_fit_mesh_ik", type=str,
                        choices=["iknet", "iksolver"], default="iknet")
    parser.add_argument("--postprocess_fit_mesh_use_fitted_joints", action="store_true")
    parser.add_argument("--use_pseudo_hand_root", action="store_true")
    parser.add_argument("--postprocess_draw", action="store_true")
    parser.add_argument("--postprocess_draw_path", type=str, default=None)
    return parser


def parse_args(argv=None) -> Tuple[argparse.Namespace, dict, list]:
    parser = build_parser()
    arg, custom = parser.parse_known_args(argv)
    if arg.resume:
        if arg.cfg:
            logger.warning(
                f"config will be rewritten by {os.path.join(arg.resume, 'dump_cfg.yaml')}")
        cfg = load_config(os.path.join(arg.resume, "dump_cfg.yaml"))
    else:
        cfg = load_config(arg.cfg) if arg.cfg else {}
        cfg["FILE_NAME"] = arg.cfg
    if arg.batch_size:
        cfg.setdefault("TRAIN", {})["BATCH_SIZE"] = arg.batch_size
    elif "TRAIN" in cfg:
        arg.batch_size = cfg["TRAIN"].get("BATCH_SIZE", 128)
    return arg, cfg, custom


def parse_extra_args(custom_arg_string) -> argparse.Namespace:
    """ArtiBoost generation flags (parity: ``anakin/opt_extra.py``)."""
    parser = argparse.ArgumentParser()
    parser.add_argument("--opg_batch_size", type=int, default=256)
    parser.add_argument("--opg_num_workers", type=int, default=20)
    parser.add_argument("--gpu_render_id", type=str, default=None,
                        help="compat no-op: rendering runs on-device")
    parser.add_argument("--synth_root", type=str, default=None,
                        help="compat no-op: the pose cache lives on device")
    extra, _ = parser.parse_known_args(custom_arg_string)
    return extra
