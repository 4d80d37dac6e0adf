"""Evaluator: fan-out feed to the metric list (parity:
``anakin/metrics/evaluator.py:12-90``)."""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.metrics.lossesmetric import LossesMetric
from artiboost_tpu.metrics.metric import Metric
from artiboost_tpu.metrics.vismetric import VisMetric
from artiboost_tpu.utils.logger import logger
from artiboost_tpu.utils.registry import METRIC, build_from_cfg


class Evaluator:
    def __init__(self, metrics_list: List[Metric]) -> None:
        self._metrics_list = metrics_list
        self.clean = True

    @property
    def metrics_list(self) -> List[Metric]:
        return self._metrics_list

    def reset_all(self):
        for metric in self._metrics_list:
            metric.reset()
        self.clean = True

    @property
    def losses_metric(self) -> Optional[LossesMetric]:
        for metric in self._metrics_list:
            if isinstance(metric, LossesMetric):
                return metric
        return None

    def feed_all(self, preds: Dict, targs: Dict, losses: Dict, **kwargs):
        self.clean = False
        batch_size = preds[next(iter(preds))].shape[0]
        if Queries.SAMPLE_VALID in targs:
            # repeat-padded eval tail: weight the loss running averages
            # by the true sample count (the fetch happens at most once —
            # only the final batch of an eval pass carries the mask)
            batch_size = int(np.asarray(targs[Queries.SAMPLE_VALID]).sum())
        for metric in self._metrics_list:
            if isinstance(metric, LossesMetric):
                metric.feed(losses=losses, batch_size=batch_size)
            else:
                metric.feed(preds=preds, targs=targs, **kwargs)

    def get_measures_all(self) -> Dict[str, Dict]:
        measures_all: Dict[str, Dict] = {}
        for metric in self._metrics_list:
            if isinstance(metric, VisMetric):
                continue
            name = type(metric).__name__
            if name in measures_all:
                logger.warning(f"duplicate metric {name}; value will be overwritten")
            measures_all[name] = metric.get_measures()
        return measures_all

    def get_measures_all_striped(self, return_losses: bool = True) -> Dict[str, Dict[str, float]]:
        """Scalar-only view for TB/text dumps."""
        out: Dict[str, Dict[str, float]] = {}
        for metric in self._metrics_list:
            if isinstance(metric, VisMetric):
                continue
            if isinstance(metric, LossesMetric) and not return_losses:
                continue
            name = type(metric).__name__
            if hasattr(metric, "get_scalar_measures"):
                # cheap scalar path (ValMetrics' full get_measures builds
                # 57k-entry triplet dicts that this view would discard)
                scalars = dict(metric.get_scalar_measures())
            else:
                scalars = {
                    k: float(v)
                    for k, v in metric.get_measures().items()
                    if isinstance(v, (int, float))
                }
            if scalars:
                out[name] = scalars
        return out

    def __str__(self):
        return " | ".join(
            s for s in (str(m) for m in self._metrics_list if not isinstance(m, VisMetric)) if s
        )


def build_evaluator(metric_cfg_list: List[Dict], data_preset: Optional[Dict] = None,
                    **extra_defaults) -> Evaluator:
    defaults = dict(extra_defaults)
    if data_preset is not None:
        defaults["DATA_PRESET"] = data_preset
    metrics = [build_from_cfg(c, METRIC, defaults or None) for c in metric_cfg_list]
    return Evaluator(metrics)
