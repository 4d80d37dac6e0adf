"""Every shipped YAML config must build its arch + criterion + evaluator.

Mirrors the reference repo's config surface: 1 train config + 5 eval
configs (``config/``, ``config_eval/``); parity with the registry-driven
construction in ``anakin/utils/builder.py``.
"""
import glob
import os

import jax
import numpy as np
import pytest

from artiboost_tpu.criterions import build_criterion
from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.metrics.evaluator import build_evaluator
from artiboost_tpu.models import build_arch
from artiboost_tpu.utils.config import load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALL_CFGS = sorted(
    glob.glob(os.path.join(REPO, "config", "*.yaml"))
    + glob.glob(os.path.join(REPO, "config_eval", "*.yaml"))
)


@pytest.mark.parametrize("path", ALL_CFGS, ids=[os.path.basename(p) for p in ALL_CFGS])
def test_config_builds(path):
    cfg = load_config(path)
    arch = build_arch(cfg["ARCH"], cfg.get("DATA_PRESET", {}))
    criterion = build_criterion(cfg, cfg.get("DATA_PRESET", {}))
    evaluator = build_evaluator(cfg["EVALUATOR"], cfg.get("DATA_PRESET", {}))
    assert arch is not None and criterion is not None and evaluator is not None


def test_flagship_eval_config_forward():
    """The flagship eval config's arch initializes and runs a tiny forward."""
    cfg = load_config(os.path.join(REPO, "config_eval",
                                   "eval_ho3dv2_clasbased_artiboost.yaml"))
    cfg["DATA_PRESET"]["IMAGE_SIZE"] = [64, 64]
    cfg["ARCH"]["HYBRID_HEAD"]["DEPTH_RESOLUTION"] = 8
    cfg["ARCH"]["HYBRID_HEAD"]["HEATMAP_SIZE"] = [8, 8]
    arch = build_arch(cfg["ARCH"], cfg["DATA_PRESET"])
    rng = np.random.RandomState(0)
    B = 2
    intr = np.tile(np.array([[435.0, 0, 32], [0, 435.0, 32], [0, 0, 1]],
                            np.float32), (B, 1, 1))
    batch = {
        Queries.IMAGE: rng.rand(B, 64, 64, 3).astype(np.float32),
        Queries.ROOT_JOINT: np.tile([0, 0, 0.5], (B, 1)).astype(np.float32),
        Queries.CAM_INTR: intr,
        Queries.CORNERS_CAN: rng.randn(B, 8, 3).astype(np.float32) * 0.05,
    }
    variables = arch.init(jax.random.PRNGKey(0), batch, train=False)
    out = arch.apply(variables, batch, train=False)
    assert out["joints_3d_abs"].shape == (B, 21, 3)
    assert out["corners_3d_abs"].shape == (B, 8, 3)
