"""Generic MLP head (parity: ``anakin/models/mlp.py`` MLP_O)."""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from artiboost_tpu.utils.misc import resolve_dtype
from artiboost_tpu.utils.registry import MODEL


class MLP(nn.Module):
    layers_n: Sequence[int] = (512, 256, 128)
    out_channel: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        for width in self.layers_n[1:]:
            x = nn.relu(nn.Dense(width, dtype=self.dtype)(x))
        return nn.Dense(self.out_channel, dtype=self.dtype)(x).astype(jnp.float32)


@MODEL.register_module(name="MLP_O")
def build_mlp_o(**cfg):
    return MLP(
        layers_n=tuple(cfg.get("LAYERS_N", (512, 256, 128))),
        out_channel=cfg.get("OUT_CHANNEL", 6),
        dtype=resolve_dtype(cfg.get("DTYPE")),
    )
