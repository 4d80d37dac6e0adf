"""Mean end-point-error metrics (parity: ``anakin/metrics/meanepe.py``).

TPU redesign: masked (sum, count) accumulate ON DEVICE per feed — one
async dispatch per key, no blocking device->host fetch in the train
loop. The unseen-object corner filter (``meanepe.py:62-66``) becomes a
device mask. Host sees scalars only in ``get_measures``.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.metrics.metric import AverageMeter, Metric
from artiboost_tpu.utils.registry import METRIC


from functools import partial


@partial(jax.jit, static_argnames=("filter_idxs", "use_valid"))
def _acc_epe(sum_: jnp.ndarray, n_: jnp.ndarray, pred: jnp.ndarray,
             targ: jnp.ndarray, obj_idx, filter_idxs: tuple,
             valid, use_valid: bool = False):
    # the unseen-object mask is built INSIDE the jit from static indices:
    # host-created mask constants would cost an upload round-trip per step.
    # `valid` (the repeat-padded-tail mask, Queries.SAMPLE_VALID) is a
    # device array already present in padded eval batches; use_valid is
    # static so full batches compile a maskless executable.
    d = jnp.mean(jnp.linalg.norm(pred - targ, axis=2), axis=1)  # (B,)
    mask = jnp.ones(d.shape, jnp.float32)
    if filter_idxs:
        for idx in filter_idxs:
            mask = mask * (obj_idx != idx).astype(jnp.float32)
    if use_valid:
        mask = mask * valid.astype(jnp.float32)
    return sum_ + jnp.sum(d * mask), n_ + jnp.sum(mask)


class _MeanEPE(Metric):
    def __init__(self, **cfg) -> None:
        super().__init__()
        self.val_keys_list: List[str] = cfg["VAL_KEYS"]
        self.to_millimeters = cfg.get("MILLIMETERS", False)
        arg = cfg.get("ARG") or cfg.get("arg")
        self.filter_unseen_obj_idxs = (
            getattr(arg, "filter_unseen_obj_idxs", []) if arg is not None
            else cfg.get("FILTER_UNSEEN_OBJ_IDXS", [])
        )
        self.reset()

    def reset(self):
        self.count = 0
        self._acc: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {
            k: (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))
            for k in self.val_keys_list
        }

    def feed(self, preds: Dict, targs: Dict, **kwargs):
        from artiboost_tpu.utils.batching import key_validity

        for key in self.val_keys_list:
            pred_val = preds[key]
            if "_abs" in key:
                targ_key = key.replace("_abs", "")
                val = jnp.asarray(targs[targ_key]) \
                    + jnp.asarray(targs[Queries.ROOT_JOINT])[:, None]
                # abs targets depend on the root too: a union-batch sample
                # with a zero-filled root has a wrong abs target (ADVICE r4)
                kv = key_validity(targs, targ_key, Queries.ROOT_JOINT)
            else:
                val = jnp.asarray(targs[key])
                kv = key_validity(targs, key)
            assert pred_val.ndim == 3, f"expected (B, N, 2|3), got {pred_val.shape}"

            if "corners" in key and len(self.filter_unseen_obj_idxs) > 0:
                obj_idx = jnp.asarray(targs[Queries.OBJ_IDX])
                filt = tuple(int(i) for i in self.filter_unseen_obj_idxs)
            else:
                obj_idx = pred_val[:, 0, 0]  # unused when filt is empty
                filt = ()

            valid = targs.get(Queries.SAMPLE_VALID)
            if valid is not None and kv is not None:
                valid = jnp.asarray(valid) * kv
            elif kv is not None:
                valid = kv
            s, n = self._acc[key]
            self._acc[key] = _acc_epe(
                s, n, pred_val, val, obj_idx, filt,
                pred_val[:, 0, 0] if valid is None else jnp.asarray(valid),
                use_valid=valid is not None)
        self.count += int(preds[self.val_keys_list[0]].shape[0])

    @property
    def avg_meters(self) -> Dict[str, AverageMeter]:
        """Host view of the device accumulators (fetches; use at epoch
        boundaries, not per step)."""
        scale = 1000.0 if self.to_millimeters else 1.0
        flat = np.asarray(jnp.stack(
            [jnp.stack(self._acc[k]) for k in self.val_keys_list]))  # (K, 2)
        out = {}
        for k, (s, n) in zip(self.val_keys_list, flat):
            m = AverageMeter()
            m.update(float(s) * scale, n=int(round(float(n))))
            out[k] = m
        return out

    def get_measures(self, **kwargs) -> Dict[str, float]:
        return {f"{k}_mepe": v.avg for k, v in self.avg_meters.items()}

    def __str__(self):
        return " | ".join(f"{k}_mepe: {v.avg:6.4f}"
                          for k, v in self.avg_meters.items())


@METRIC.register_module
class Mean3DEPE(_MeanEPE):
    pass


@METRIC.register_module
class Mean2DEPE(_MeanEPE):
    def __init__(self, **cfg) -> None:
        super().__init__(**cfg)
        self.to_millimeters = False
