"""ResNet backbones in flax.linen (NHWC, TPU-native layout).

Parity with the reference backbones (``anakin/models/resnet.py:199-274``):
returns a dict with ``res_layer1..4`` pyramid features plus
``res_layer4_mean`` (global average pool). Weight layout differs from
torchvision (NHWC + HWIO); the checkpoint converter in
``artiboost_tpu/utils/torch_convert.py`` maps between them.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from artiboost_tpu.utils.misc import resolve_dtype
from artiboost_tpu.utils.registry import BACKBONE

ModuleDef = Any


class BasicBlock(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)
        residual = x
        y = nn.Conv(self.features, (3, 3), self.strides, padding=1, use_bias=False, dtype=self.dtype)(x)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, dtype=self.dtype)(y)
        y = norm()(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1), self.strides, use_bias=False, dtype=self.dtype)(x)
            residual = norm()(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int  # width of the 3x3; output is 4x this
    strides: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.relu(norm()(y))
        y = nn.Conv(self.features, (3, 3), self.strides, padding=1, use_bias=False, dtype=self.dtype)(y)
        y = nn.relu(norm()(y))
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = norm()(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features * 4, (1, 1), self.strides, use_bias=False, dtype=self.dtype)(x)
            residual = norm()(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    block_cls: ModuleDef
    stage_sizes: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        """image: (B, H, W, 3) float. Returns the feature-pyramid dict."""
        x = image.astype(self.dtype)
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        features: Dict[str, jnp.ndarray] = {}
        widths = (64, 128, 256, 512)
        for i, (n_blocks, w) in enumerate(zip(self.stage_sizes, widths)):
            for j in range(n_blocks):
                strides = (2, 2) if (i > 0 and j == 0) else (1, 1)
                x = self.block_cls(w, strides, dtype=self.dtype, name=f"layer{i + 1}_{j}")(x, train=train)
            features[f"res_layer{i + 1}"] = x
        features["res_layer4_mean"] = jnp.mean(x, axis=(1, 2))
        return features


# linen modules are frozen dataclasses, so the registry entries are
# factory functions rather than subclasses
def _make_factory(name, block, sizes):
    def factory(**cfg):
        return ResNet(block_cls=block, stage_sizes=sizes, dtype=resolve_dtype(cfg.get("DTYPE")))

    factory.__name__ = name
    return BACKBONE.register_module(factory, name=name)


ResNet18 = _make_factory("ResNet18", BasicBlock, (2, 2, 2, 2))
ResNet34 = _make_factory("ResNet34", BasicBlock, (3, 4, 6, 3))
ResNet50 = _make_factory("ResNet50", Bottleneck, (3, 4, 6, 3))
ResNet101 = _make_factory("ResNet101", Bottleneck, (3, 4, 23, 3))
ResNet152 = _make_factory("ResNet152", Bottleneck, (3, 8, 36, 3))


BACKBONE_OUT_CHANNELS = {
    "ResNet18": 512,
    "ResNet34": 512,
    "ResNet50": 2048,
    "ResNet101": 2048,
    "ResNet152": 2048,
}
