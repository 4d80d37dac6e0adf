"""Weighted-sum loss aggregator (parity: ``anakin/criterions/criterion.py``).

Losses are pure callables ``loss(preds, targs, key) -> (scalar, dict)``;
``Criterion.compute_losses`` is jit-safe and threads an explicit PRNG
key (the reference relies on global ``random``/``torch`` RNG instead).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from artiboost_tpu.utils.logger import logger
from artiboost_tpu.utils.misc import camel_to_snake
from artiboost_tpu.utils.registry import LOSS, build_from_cfg


class TensorLoss:
    """Base: provides the output_key naming convention."""

    def __init__(self):
        self.output_key = f"{camel_to_snake(type(self).__name__)}_output"

    def __call__(self, preds: Dict, targs: Dict, key: Optional[jax.Array] = None
                 ) -> Tuple[jnp.ndarray, Dict]:
        return jnp.zeros((), jnp.float32), {}


class Criterion(TensorLoss):
    def __init__(self, cfg: Dict, loss_list: List[TensorLoss]):
        super().__init__()
        self._loss_list = loss_list
        self._loss_lambdas = {}
        lambdas = list(cfg["LAMBDAS"])
        for i, loss in enumerate(loss_list):
            self._loss_lambdas[type(loss).__name__] = lambdas[i]
        logger.info(
            "criterion lambdas: "
            + ", ".join(f"{k}={v}" for k, v in self._loss_lambdas.items())
        )

    @property
    def loss_list(self) -> List[TensorLoss]:
        return self._loss_list

    @property
    def loss_lambdas(self) -> Dict[str, float]:
        return self._loss_lambdas

    def compute_losses(self, preds: Dict, targs: Dict, key: Optional[jax.Array] = None
                       ) -> Tuple[jnp.ndarray, Dict]:
        total = jnp.zeros((), jnp.float32)
        all_losses: Dict[str, jnp.ndarray] = {}
        keys = (
            jax.random.split(key, len(self._loss_list))
            if key is not None else [None] * len(self._loss_list)
        )
        for loss, k in zip(self._loss_list, keys):
            name = type(loss).__name__
            final_loss, losses = loss(preds, targs, key=k)
            total = total + self._loss_lambdas[name] * final_loss
            all_losses.update(losses)
        all_losses["final_loss"] = total
        return total, all_losses


def build_criterion(cfg: Dict, data_preset: Optional[Dict] = None) -> Criterion:
    """cfg: {"CRITERION": [loss cfgs...], "LAMBDAS": [...]}."""
    default_args = {"DATA_PRESET": data_preset} if data_preset else None
    loss_list = [build_from_cfg(c, LOSS, default_args) for c in cfg["CRITERION"]]
    return Criterion(cfg, loss_list)
