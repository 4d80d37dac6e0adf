"""PCK / AUC metrics (parity: ``anakin/metrics/pckmetric.py``).

TPU redesign: per-batch distances stay ON DEVICE as deferred jnp chunks
(one async norm dispatch per feed, no blocking fetch in the train loop);
``get_measures`` concatenates and crosses to the host ONCE, after which
the curve/AUC logic is identical to the reference's.
"""
from __future__ import annotations

from abc import abstractmethod
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from artiboost_tpu.datasets.hoquery import Queries

_trapezoid = getattr(np, "trapezoid", None) or np.trapz
from artiboost_tpu.metrics.metric import Metric
from artiboost_tpu.utils.misc import CONST
from artiboost_tpu.utils.registry import METRIC


@jax.jit
def _dist_chunk(kp_preds: jnp.ndarray, kp_targs: jnp.ndarray,
                kp_vis: jnp.ndarray):
    return (jnp.linalg.norm(kp_preds - kp_targs, axis=-1),
            kp_vis.astype(jnp.float32))


class PCKMetric(Metric):
    def __init__(self, **cfg) -> None:
        super().__init__()
        self.val_min = cfg["VAL_MIN"]
        self.val_max = cfg["VAL_MAX"]
        self.steps = cfg["STEPS"]
        self.reset()

    @property
    @abstractmethod
    def num_kp(self):
        ...

    @abstractmethod
    def _get_predictions(self, preds: Dict, targs: Dict):
        """-> (kp_preds (B,N,D), kp_targs (B,N,D), kp_vis (B,N))."""

    _FOLD = 64  # device chunks per host fold: a fixed fold width keeps
    # the concat executable cached (a grow-as-you-go concat would
    # recompile at every new length) and costs one fetch per _FOLD feeds

    def reset(self):
        self._dists: List[jnp.ndarray] = []  # device chunks of (B, N)
        self._vis: List[jnp.ndarray] = []
        self._host_dists: List[np.ndarray] = []
        self._host_vis: List[np.ndarray] = []
        self.count = 0

    def feed(self, preds: Dict, targs: Dict, **kwargs):
        kp_preds, kp_targs, kp_vis = self._get_predictions(preds, targs)
        kp_vis = jnp.asarray(kp_vis)
        if Queries.SAMPLE_VALID in targs:
            # repeat-padded eval-tail rows count as invisible keypoints
            kp_vis = kp_vis * jnp.asarray(targs[Queries.SAMPLE_VALID])[:, None]
        dist, vis = _dist_chunk(jnp.asarray(kp_preds), jnp.asarray(kp_targs),
                                kp_vis)
        self._dists.append(dist)
        self._vis.append(vis)
        self.count += kp_preds.shape[0]
        if len(self._dists) >= self._FOLD:
            self._fold()

    def _fold(self):
        if not self._dists:
            return
        self._host_dists.append(np.asarray(jnp.concatenate(self._dists, 0)))
        self._host_vis.append(np.asarray(jnp.concatenate(self._vis, 0)))
        self._dists, self._vis = [], []

    def _stacked(self):
        self._fold()
        dists = np.concatenate(self._host_dists, 0)
        vis = np.concatenate(self._host_vis, 0) > 0.5
        return dists, vis

    def get_pck_all(self, threshold) -> float:
        dists, vis = self._stacked()
        pcks = []
        for i in range(self.num_kp):
            d = dists[:, i][vis[:, i]]
            if d.size:
                pcks.append(np.mean(d <= threshold))
        return float(np.mean(pcks)) if pcks else float("nan")

    def get_measures(self) -> Dict:
        thresholds = np.linspace(self.val_min, self.val_max, self.steps)
        area_under_one = _trapezoid(np.ones_like(thresholds), thresholds)
        dists, vis = self._stacked()
        epe_mean_per_kp, auc_per_kp, pck_curve_per_kp = [], [], []
        for i in range(self.num_kp):
            d = dists[:, i][vis[:, i]]
            if d.size == 0:
                continue
            epe_mean_per_kp.append(np.mean(d))
            pck_curve = np.array([np.mean(d <= t) for t in thresholds])
            pck_curve_per_kp.append(pck_curve)
            auc_per_kp.append(_trapezoid(pck_curve, thresholds) / area_under_one)
        return {
            "epe_mean_per_kp": np.array(epe_mean_per_kp),
            "pck_curve_per_kp": np.array(pck_curve_per_kp),
            "auc_per_kp": np.array(auc_per_kp),
            "epe_mean_all": float(np.mean(epe_mean_per_kp)),
            "auc_all": float(np.mean(auc_per_kp)),
            "thresholds": thresholds,
        }

    def __str__(self):
        m = self.get_measures()
        return f"auc: {m['auc_all']:6.4f} | epe: {m['epe_mean_all']:6.4f}"


@METRIC.register_module
class Hand3DPCKMetric(PCKMetric):
    num_kp = CONST.NUM_JOINTS

    def _get_predictions(self, preds, targs):
        targ = targs[Queries.JOINTS_3D] + targs[Queries.ROOT_JOINT][:, None]
        return preds["joints_3d_abs"], targ, targs[Queries.JOINTS_VIS]


@METRIC.register_module
class Obj3DPCKMetric(PCKMetric):
    num_kp = CONST.NUM_CORNERS

    def _get_predictions(self, preds, targs):
        targ = targs[Queries.CORNERS_3D] + targs[Queries.ROOT_JOINT][:, None]
        return preds["corners_3d_abs"], targ, targs[Queries.CORNERS_VIS]


@METRIC.register_module
class Hand2DPCKMetric(PCKMetric):
    num_kp = CONST.NUM_JOINTS

    def _get_predictions(self, preds, targs):
        return preds["joints_2d"], targs[Queries.JOINTS_2D], targs[Queries.JOINTS_VIS]


@METRIC.register_module
class Obj2DPCKMetric(PCKMetric):
    num_kp = CONST.NUM_CORNERS

    def _get_predictions(self, preds, targs):
        return preds["corners_2d"], targs[Queries.CORNERS_2D], targs[Queries.CORNERS_VIS]
