"""IKNet — MLP mapping 21 joints -> 16 MANO joint rotations (quats).

Parity: ``anakin/postprocess/iknet/model.py`` (torch). Used to
initialize the MANO pose before the fitting optimization. Weights can be
imported from the released torch checkpoint via utils.torch_convert.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from artiboost_tpu.utils.transform import quat_to_aa


class IKNet(nn.Module):
    njoints: int = 21
    hidden_size_pose: Sequence[int] = (256, 512, 1024, 1024, 512, 256)

    @nn.compact
    def __call__(self, joints: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """joints (B, 21, 3) -> (so3 (B, 48), quats (B, 16, 4))."""
        x = joints.reshape(joints.shape[0], self.njoints * 3)
        for width in self.hidden_size_pose:
            x = nn.Dense(width)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            x = nn.relu(x)
        quat = nn.Dense(16 * 4)(x).reshape(-1, 16, 4)
        quat = quat / jnp.maximum(
            jnp.linalg.norm(quat, axis=-1, keepdims=True), 1e-8)
        so3 = quat_to_aa(quat).reshape(-1, 48)
        return so3, quat
