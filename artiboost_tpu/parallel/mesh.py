"""Device mesh + sharding helpers.

The reference parallelizes with single-process ``torch.nn.DataParallel``
(``train/train_artiboost.py:131``); here data parallelism is a ``data``
mesh axis with parameters replicated and gradients reduced by XLA psum
over ICI. A ``model`` axis is reserved for future sharding of the
renderer/CCV sweep (SURVEY §2.10).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_data: Optional[int] = None, n_model: int = 1,
             devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    dev_array = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Place a host batch dict with leading batch dim onto the mesh's
    data axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
