"""Batched MANO mesh fitting (parity: ``anakin/postprocess/iknet/
fittingunit.py``).

The reference loops per-sample: IKNet init -> 20 JAX-adam steps on a
residual of pose/shape regularizers + normalized joint error + geometric
finger-planarity prior. Here the whole batch fits at once: the adam loop
is a ``lax.fori_loop`` over optax updates, vmapped across the batch by
construction (all ops batched), which is the idiomatic TPU shape of the
same algorithm.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax

from artiboost_tpu.mano.layer import mano_forward
from artiboost_tpu.mano.model import ManoModel, get_mano_model
from artiboost_tpu.postprocess.iknet import IKNet


def geo_prior(joints: jnp.ndarray) -> jnp.ndarray:
    """Finger planarity/ordering prior (fittingunit.py geo(), :43-59)."""
    idx_a = jnp.asarray([1, 5, 9, 13, 17])
    idx_b = jnp.asarray([2, 6, 10, 14, 18])
    idx_c = jnp.asarray([3, 7, 11, 15, 19])
    idx_d = jnp.asarray([4, 8, 12, 16, 20])
    v_ab = joints[:, idx_a] - joints[:, idx_b]
    v_bc = joints[:, idx_b] - joints[:, idx_c]
    v_cd = joints[:, idx_c] - joints[:, idx_d]
    n1 = jnp.cross(v_ab, v_bc)
    loss_1 = jnp.abs(jnp.sum(n1 * v_cd, -1)).mean()
    loss_2 = -jnp.clip(jnp.sum(n1 * jnp.cross(v_bc, v_cd), -1), None, 0.0).mean()
    return 1e4 * loss_1 + 1e5 * loss_2


class FittingUnit:
    """joints (B, 21, 3) camera-space -> fitted MANO verts/joints."""

    def __init__(self, mano_model: Optional[ManoModel] = None, n_steps: int = 20,
                 lr: float = 0.03, iknet_params=None):
        self.mano_model = mano_model if mano_model is not None else get_mano_model()
        self.n_steps = n_steps
        self.lr = lr
        self.iknet = IKNet()
        if iknet_params is None:
            iknet_params = self.iknet.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 21, 3)), train=False)
        self.iknet_params = iknet_params
        self._fit = jax.jit(self._fit_impl)

    def _fit_impl(self, joints_abs: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        B = joints_abs.shape[0]
        root = joints_abs[:, 0:1]  # wrist as root (fittingunit convention)
        bone = jnp.linalg.norm(joints_abs[:, 9] - joints_abs[:, 0],
                               axis=1, keepdims=True)[:, None]  # (B, 1, 1)
        joints_norm = (joints_abs - root) / jnp.maximum(bone, 1e-8)

        # ---- IKNet initialization ----
        so3_init, _ = self.iknet.apply(self.iknet_params, joints_norm, train=False)
        beta_init = jnp.zeros((B, 10))

        optimizer = optax.adam(self.lr, b1=0.5, b2=0.5)

        def residuals(params):
            so3, beta = params["so3"], params["beta"]
            out = mano_forward(self.mano_model, so3, beta)
            j = out.joints - out.joints[:, 0:1]
            bone_pred = jnp.linalg.norm(j[:, 9] - j[:, 0] + 1e-8, axis=1,
                                        keepdims=True)[:, None]
            j_norm = j / jnp.maximum(bone_pred, 1e-8)
            reg = jnp.mean((so3 - so3_init) ** 2)
            reg_beta = jnp.mean((beta - beta_init) ** 2)
            errkp = jnp.mean((j_norm - joints_norm) ** 2)
            j_abs = j_norm * bone + root
            return 0.01 * reg + 0.01 * reg_beta + errkp + 100.0 * geo_prior(j_abs)

        grad_fn = jax.grad(residuals)
        params = {"so3": so3_init, "beta": beta_init}
        opt_state = optimizer.init(params)

        def body(_, carry):
            params, opt_state = carry
            updates, opt_state = optimizer.update(grad_fn(params), opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        params, _ = jax.lax.fori_loop(0, self.n_steps, body, (params, opt_state))

        # ---- decode fitted mesh back into camera space ----
        out = mano_forward(self.mano_model, params["so3"], params["beta"])
        v = out.verts - out.joints[:, 0:1]
        j = out.joints - out.joints[:, 0:1]
        bone_pred = jnp.linalg.norm(j[:, 9] - j[:, 0] + 1e-8, axis=1,
                                    keepdims=True)[:, None]
        scale = bone / jnp.maximum(bone_pred, 1e-8)
        return {
            "hand_verts": v * scale + root,
            "joints": j * scale + root,
            "so3": params["so3"],
            "beta": params["beta"],
        }

    def __call__(self, joints_abs, batch: Optional[Dict] = None) -> Dict:
        return self._fit(jnp.asarray(joints_abs))
