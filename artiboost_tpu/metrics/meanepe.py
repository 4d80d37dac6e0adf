"""Mean end-point-error metrics (parity: ``anakin/metrics/meanepe.py``).

The per-batch distance math runs jitted on device; only the (sum, count)
scalars cross to the host per step.
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.metrics.metric import AverageMeter, Metric
from artiboost_tpu.utils.registry import METRIC


@jax.jit
def _epe_per_sample(pred: jnp.ndarray, targ: jnp.ndarray) -> jnp.ndarray:
    """(B, N, D) x2 -> (B,) mean keypoint distance."""
    return jnp.mean(jnp.linalg.norm(pred - targ, axis=2), axis=1)


class _MeanEPE(Metric):
    def __init__(self, **cfg) -> None:
        super().__init__()
        self.val_keys_list: List[str] = cfg["VAL_KEYS"]
        self.avg_meters: Dict[str, AverageMeter] = {k: AverageMeter() for k in self.val_keys_list}
        self.to_millimeters = cfg.get("MILLIMETERS", False)
        arg = cfg.get("ARG") or cfg.get("arg")
        self.filter_unseen_obj_idxs = (
            getattr(arg, "filter_unseen_obj_idxs", []) if arg is not None
            else cfg.get("FILTER_UNSEEN_OBJ_IDXS", [])
        )
        self.reset()

    def reset(self):
        self.count = 0
        for meter in self.avg_meters.values():
            meter.reset()

    def feed(self, preds: Dict, targs: Dict, **kwargs):
        for key in self.val_keys_list:
            pred_val = preds[key]
            if "_abs" in key:
                targ_key = key.replace("_abs", "")
                val = targs[targ_key] + targs[Queries.ROOT_JOINT][:, None]
            else:
                val = targs[key]
            assert pred_val.ndim == 3, f"expected (B, N, 2|3), got {pred_val.shape}"
            dist_batch = np.asarray(_epe_per_sample(pred_val, val))
            if self.to_millimeters:
                dist_batch = dist_batch * 1000.0

            if "corners" in key and len(self.filter_unseen_obj_idxs) > 0:
                obj_idx = np.asarray(targs[Queries.OBJ_IDX])
                mask = np.ones_like(obj_idx, dtype=bool)
                for idx in self.filter_unseen_obj_idxs:
                    mask &= obj_idx != idx
                dist_batch = dist_batch[mask]

            self.avg_meters[key].update(float(dist_batch.sum()), n=int(dist_batch.shape[0]))
        self.count += int(preds[self.val_keys_list[0]].shape[0])

    def get_measures(self, **kwargs) -> Dict[str, float]:
        return {f"{k}_mepe": self.avg_meters[k].avg for k in self.val_keys_list}

    def __str__(self):
        return " | ".join(f"{k}_mepe: {self.avg_meters[k].avg:6.4f}" for k in self.val_keys_list)


@METRIC.register_module
class Mean3DEPE(_MeanEPE):
    pass


@METRIC.register_module
class Mean2DEPE(_MeanEPE):
    def __init__(self, **cfg) -> None:
        super().__init__(**cfg)
        self.to_millimeters = False
