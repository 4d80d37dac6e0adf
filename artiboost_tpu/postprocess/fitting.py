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
    """joints (B, 21, 3) camera-space -> fitted MANO verts/joints.

    ``ik_mode`` selects the initialization (the reference parses the same
    ``--postprocess_fit_mesh_ik {iknet,iksolver}`` choice,
    ``anakin/opt.py:39-41``, but only ships the iknet path):

    - ``iknet``: a trained IKNet predicts per-joint rotations as the adam
      warm start (20 steps suffice, ``fittingunit.py:131-136``).
    - ``iksolver``: pure optimization from the flat (zero-pose) hand — no
      learned component; the pose/shape regularizers anchor to zero and
      the loop runs longer (default 100 steps) to converge cold.
    """

    def __init__(self, mano_model: Optional[ManoModel] = None,
                 n_steps: Optional[int] = None,
                 lr: float = 0.03, iknet_params=None, ik_mode: str = "iknet"):
        if ik_mode not in ("iknet", "iksolver"):
            raise ValueError(f"unknown ik_mode {ik_mode!r} "
                             "(choices: iknet, iksolver)")
        self.mano_model = mano_model if mano_model is not None else get_mano_model()
        self.ik_mode = ik_mode
        self.n_steps = int(n_steps) if n_steps is not None else \
            (20 if ik_mode == "iknet" else 100)
        self.lr = lr
        self.iknet = IKNet()
        if ik_mode == "iksolver":
            iknet_params = None  # never loaded nor used
        elif iknet_params is None:
            import os

            from artiboost_tpu.utils.logger import logger
            from artiboost_tpu.utils.misc import asset_path

            native = asset_path("assets/iknet_tpu.npz")  # script/train_iknet.py output
            if os.path.isfile(native):
                iknet_params = load_iknet_params(native)
            else:
                logger.warning(
                    "fitting: assets/iknet_tpu.npz not found; IKNet init is "
                    "RANDOM (fit quality degrades; run script/train_iknet.py)")
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

        # ---- initialization (IKNet warm start, or flat hand) ----
        if self.ik_mode == "iknet":
            so3_init, _ = self.iknet.apply(self.iknet_params, joints_norm,
                                           train=False)
        else:
            so3_init = jnp.zeros((B, 48))
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
            # geo_prior carries its own 1e4/1e5 weights; an extra factor
            # here swamps the keypoint term (measured: 20-step fits got
            # WORSE than the IKNet init, 7.1mm -> 9.6mm, with 100x)
            return 0.01 * reg + 0.01 * reg_beta + errkp + geo_prior(j_abs)

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


# --------------------------------------------------------------------------
# Training IKNet (replaces the released torch iknet checkpoint)
# --------------------------------------------------------------------------
#
# The reference ships pretrained iknet weights and never trains them
# (``anakin/postprocess/iknet/checkpoints.py``). Ours trains natively on
# synthetic MANO FK data: sample poses, FK to joints, normalize exactly as
# the fitting unit does, and supervise the predicted per-joint quaternions
# (sign-invariant) plus FK joint reconstruction THROUGH quat->rotmat FK —
# never through quat_to_aa, whose backward is singular at identity.


def make_iknet_train_step(mano_model: ManoModel, iknet: IKNet,
                          learning_rate: float = 1e-3,
                          w_quat: float = 1.0, w_joints: float = 10.0):
    """-> (init_fn(key) -> (vars, opt_state), step_fn).

    step_fn(variables, opt_state, key) -> (variables, opt_state, metrics).
    """
    from artiboost_tpu.mano.layer import mano_forward_rotmat
    from artiboost_tpu.utils.transform import aa_to_quat, quat_to_rotmat

    tx = optax.adam(learning_rate)

    def init_fn(key):
        variables = iknet.init(key, jnp.zeros((1, 21, 3)), train=True)
        return variables, tx.init(variables["params"])

    def _sample_batch(key, B=256):
        k1, k2, k3 = jax.random.split(key, 3)
        sigma = jax.random.uniform(k3, (B, 1), minval=0.05, maxval=0.5)
        pose = jax.random.normal(k1, (B, 48)) * sigma
        shape = jax.random.normal(k2, (B, 10)) * 0.5
        out = mano_forward(mano_model, pose, shape)
        j = out.joints - out.joints[:, 0:1]
        bone = jnp.linalg.norm(j[:, 9] - j[:, 0], axis=1, keepdims=True)[:, None]
        j_norm = j / jnp.maximum(bone, 1e-8)
        q_tgt = aa_to_quat(pose.reshape(B, 16, 3))
        # canonical sign (w >= 0) so the sign-invariant loss is stable
        q_tgt = q_tgt * jnp.sign(q_tgt[..., :1] + 1e-12)
        return j_norm, q_tgt, shape

    def loss_fn(params, batch_stats, key):
        j_norm, q_tgt, shape = _sample_batch(key)
        (so3, quat), updates = iknet.apply(
            {"params": params, "batch_stats": batch_stats}, j_norm,
            train=True, mutable=["batch_stats"])
        l_quat = jnp.mean(jnp.minimum(
            jnp.sum((quat - q_tgt) ** 2, -1),
            jnp.sum((quat + q_tgt) ** 2, -1)))
        rots = quat_to_rotmat(quat)
        out = mano_forward_rotmat(mano_model, rots, shape)
        j = out.joints - out.joints[:, 0:1]
        bone = jnp.linalg.norm(j[:, 9] - j[:, 0], axis=1, keepdims=True)[:, None]
        j_rec = j / jnp.maximum(bone, 1e-8)
        l_joints = jnp.mean(jnp.sum((j_rec - j_norm) ** 2, -1))
        loss = w_quat * l_quat + w_joints * l_joints
        return loss, (updates["batch_stats"],
                      {"loss": loss, "l_quat": l_quat, "l_joints": l_joints})

    @jax.jit
    def step_fn(variables, opt_state, key):
        (_, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables["params"],
                                   variables.get("batch_stats", {}), key)
        updates, opt_state = tx.update(grads, opt_state, variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        return {"params": params, "batch_stats": new_stats}, opt_state, metrics

    return init_fn, step_fn


def save_iknet_params(variables, path: str) -> None:
    """Flat-npz snapshot (pairs with ``load_iknet_params``)."""
    import numpy as np
    from flax.traverse_util import flatten_dict

    flat = {"/".join(k): np.asarray(v)
            for k, v in flatten_dict(variables).items()}
    np.savez(path, **flat)


def load_iknet_params(path: str):
    import numpy as np
    from flax.traverse_util import unflatten_dict

    blob = np.load(path)
    return unflatten_dict({tuple(k.split("/")): jnp.asarray(blob[k])
                           for k in blob.files})
