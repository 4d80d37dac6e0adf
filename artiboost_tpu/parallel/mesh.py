"""Device mesh + sharding helpers, single- and multi-process.

The reference parallelizes with single-process ``torch.nn.DataParallel``
(``train/train_artiboost.py:131``); here data parallelism is a ``data``
mesh axis with parameters replicated and gradients reduced by XLA psum
over ICI. A ``model`` axis is reserved for future sharding of the
renderer/CCV sweep (SURVEY §2.10).

Multi-host (SURVEY §2.10's TPU-native growth path, beyond the
reference): ``init_distributed()`` wires ``jax.distributed.initialize``
(multi-process SPMD over DCN+ICI — every process runs the same program;
``jax.devices()`` becomes the GLOBAL device list and the mesh spans
it). Host data enters through ``put_global`` / ``shard_batch``, which
build global arrays from per-process shards when process_count > 1.
Proven by a real 2-process x 4-CPU-device run in
``tests/test_multihost.py``.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Join a multi-process SPMD job (``--multihost``).

    With no arguments, defers to the TPU-pod metadata / env autodetect
    that ``jax.distributed.initialize`` performs on real multi-host
    slices; explicit args support manual launches and the CPU-backend
    test harness (coordinator host:port + rank). Must run before any
    JAX call that initializes the backend (so NO jax.devices()-style
    probes here); a repeated call is a no-op."""
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=int(num_processes),
                      process_id=int(process_id))
    elif not (os.environ.get("COORDINATOR_ADDRESS")
              or os.environ.get("TPU_WORKER_HOSTNAMES")):
        return  # single-process run: nothing to join
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # already initialized -> idempotent no-op
        if "once" in str(e) or "already" in str(e):
            return
        raise


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


def put_global(x, sh: NamedSharding):
    """Place host data onto a (possibly multi-process) sharding.

    Single-process: plain ``device_put``. Multi-process: every process
    holds the FULL array (loader RNG/permutations are seed-deterministic,
    so all processes compute identical host data) and contributes only
    its addressable shards via ``make_array_from_callback`` — the
    canonical way to build a global array without requiring
    non-addressable transfers."""
    if jax.process_count() == 1:
        return jax.device_put(x, sh)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Place a host batch dict with leading batch dim onto the mesh's
    data axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: put_global(x, sh), batch)
