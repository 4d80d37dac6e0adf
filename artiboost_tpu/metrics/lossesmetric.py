"""Running averages of loss dicts (parity: ``anakin/metrics/lossesmetric.py``).

TPU redesign: the per-step loss scalars stay ON DEVICE — ``feed`` folds
them into jnp running sums with one async dispatch and never blocks on a
device->host fetch (a blocking scalar fetch costs a full dispatch
round-trip per step and serializes the train loop). Values cross to the
host only in ``get_measures``/``__str__`` (epoch end / every log_every).
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from artiboost_tpu.metrics.metric import AverageMeter, Metric
from artiboost_tpu.utils.registry import METRIC


from functools import partial


@partial(jax.jit, static_argnames=("bs",))
def _acc(sums: Dict, vals: Dict, bs: float) -> Dict:
    # bs is static: a host-created jnp scalar would cost a device upload
    # round-trip per step on a remote-tunnel runtime
    return {k: sums[k] + jnp.asarray(vals[k], jnp.float32) * bs for k in vals}


@METRIC.register_module
class LossesMetric(Metric):
    def __init__(self, **cfg) -> None:
        super().__init__()
        self._vis_loss_keys: List[str] = cfg.get("VIS_LOSS_KEYS", [])
        self.reset()

    def reset(self):
        self._sums: Dict[str, jnp.ndarray] = {}
        self._ns: Dict[str, int] = {}
        self.count = 0

    def feed(self, losses: Dict, batch_size: int = 1, **kwargs):
        vals = {k: v for k, v in losses.items() if v is not None}
        for k in vals:
            if k not in self._sums:
                self._sums[k] = jnp.zeros((), jnp.float32)
                self._ns[k] = 0
            self._ns[k] += batch_size
        self._sums.update(_acc({k: self._sums[k] for k in vals}, vals,
                               float(batch_size)))
        self.count += batch_size

    def _meters(self) -> Dict[str, AverageMeter]:
        if not self._sums:
            return {}
        # ONE stacked fetch for all keys, not one round-trip per key
        keys = list(self._sums)
        vals = np.asarray(jnp.stack([self._sums[k] for k in keys]))
        out = {}
        for k, v in zip(keys, vals):
            m = AverageMeter()
            m.update(float(v), n=self._ns[k])
            out[k] = m
        return out

    def get_measures(self, **kwargs) -> Dict:
        return {k: v.avg for k, v in self._meters().items()}

    def __str__(self) -> str:
        meters = self._meters()
        if "final_loss" not in meters:
            return "no losses"
        parts = [f"final_loss: {meters['final_loss'].avg:.5f}"]
        parts += [f"{k}: {v.avg:.5f}" for k, v in meters.items()
                  if k in self._vis_loss_keys]
        return ", ".join(parts)
