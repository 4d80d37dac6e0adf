"""Running averages of loss dicts (parity: ``anakin/metrics/lossesmetric.py``)."""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from artiboost_tpu.metrics.metric import AverageMeter, Metric
from artiboost_tpu.utils.registry import METRIC


@METRIC.register_module
class LossesMetric(Metric):
    def __init__(self, **cfg) -> None:
        super().__init__()
        self._losses: Dict[str, AverageMeter] = {}
        self._vis_loss_keys: List[str] = cfg.get("VIS_LOSS_KEYS", [])
        self.reset()

    def reset(self):
        self._losses = {}
        self.count = 0

    def feed(self, losses: Dict, batch_size: int = 1, **kwargs):
        for k, v in losses.items():
            if v is None:
                continue
            val = float(np.asarray(v))
            self._losses.setdefault(k, AverageMeter()).update_by_mean(val, batch_size)
        self.count += batch_size

    def get_measures(self, **kwargs) -> Dict:
        return {k: v.avg for k, v in self._losses.items()}

    def __str__(self) -> str:
        if "final_loss" not in self._losses:
            return "no losses"
        parts = [f"final_loss: {self._losses['final_loss'].avg:.5f}"]
        parts += [f"{k}: {v.avg:.5f}" for k, v in self._losses.items() if k in self._vis_loss_keys]
        return ", ".join(parts)
