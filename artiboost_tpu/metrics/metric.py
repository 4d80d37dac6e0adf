"""Metric ABC + AverageMeter (parity: ``anakin/metrics/metric.py``)."""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Dict


class Metric(ABC):
    def __init__(self) -> None:
        super().__init__()
        self.count = 0

    def is_empty(self) -> bool:
        return self.count == 0

    def num_sample(self) -> int:
        return self.count

    @abstractmethod
    def reset(self):
        ...

    @abstractmethod
    def feed(self, preds: Dict, targs: Dict, **kwargs):
        ...

    @abstractmethod
    def get_measures(self, **kwargs) -> Dict:
        ...


class AverageMeter:
    def __init__(self) -> None:
        self.reset()

    def reset(self):
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.sum += val
        self.count += n
        self.avg = self.sum / max(self.count, 1)

    def update_by_mean(self, val: float, n: int = 1):
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)
