"""Arch — DAG-of-models composer (parity: ``anakin/models/arch.py:11-72``).

Config is either a single model dict or a list of model dicts, each with
a ``PREVIOUS`` list naming upstream models. The (single) root is the
model no other model consumes; evaluation runs the DAG bottom-up,
merging upstream outputs into each node's input dict.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from artiboost_tpu.utils.registry import MODEL, build_model


class Arch(nn.Module):
    model_list: Tuple[nn.Module, ...]
    names: Tuple[str, ...]
    previous: Tuple[Tuple[int, ...], ...]  # indices of upstream models

    def _root_index(self) -> int:
        consumed = {i for prevs in self.previous for i in prevs}
        roots = [i for i in range(len(self.model_list)) if i not in consumed]
        if len(roots) != 1:
            raise ValueError(f"Arch DAG must have exactly one root, got {roots}")
        return roots[0]

    @nn.compact
    def __call__(self, inputs: Dict[str, jnp.ndarray], train: bool = False) -> Dict[str, jnp.ndarray]:
        cache: Dict[int, Dict[str, jnp.ndarray]] = {}

        def _forward(idx: int) -> Dict[str, jnp.ndarray]:
            if idx in cache:
                return cache[idx]
            feed = dict(inputs)
            for up in self.previous[idx]:
                feed.update(_forward(up))
            out = self.model_list[idx](feed, train=train)
            cache[idx] = out
            return out

        return _forward(self._root_index())

    def to_graph(self):
        """Edge list for visualization/debugging."""
        edges = []
        for i, prevs in enumerate(self.previous):
            for p in prevs:
                edges.append((self.names[p], self.names[i]))
        return edges


def build_arch(arch_cfg, data_preset: Dict[str, Any]) -> Arch:
    """Build an Arch from the YAML ``ARCH`` entry (dict or list of dicts)."""
    if isinstance(arch_cfg, dict):
        arch_cfg = [arch_cfg]
    names = [c["TYPE"] for c in arch_cfg]
    models: List[nn.Module] = []
    previous: List[Tuple[int, ...]] = []
    for c in arch_cfg:
        c = dict(c)
        prevs = c.pop("PREVIOUS", []) or []
        c.setdefault("DATA_PRESET", data_preset)
        models.append(build_model(c, default_args=None))
        previous.append(tuple(names.index(p) for p in prevs))
    return Arch(model_list=tuple(models), names=tuple(names), previous=tuple(previous))
