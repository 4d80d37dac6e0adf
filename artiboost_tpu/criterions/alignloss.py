"""Procrustes-aligned joint MSE (parity:
``anakin/criterions/alignloss.py:13-80``) via batched SVD."""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from artiboost_tpu.criterions.criterion import TensorLoss
from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.utils.batching import key_validity, masked_sample_mean
from artiboost_tpu.utils.registry import LOSS


def orthogonal_procrustes(A: jnp.ndarray, B: jnp.ndarray):
    """Batched: R, s minimizing ||B @ R^T * s - A|| (scipy convention used
    by the reference: svd of (B^T A)^T)."""
    m = jnp.einsum("bni,bnj->bij", A, B)  # == (B^T A)^T == A^T B
    u, w, vt = jnp.linalg.svd(m)
    R = jnp.einsum("bij,bjk->bik", u, vt)
    scale = jnp.sum(w, axis=1)[:, None, None]
    return R, scale


def procrustes_align(xyz: jnp.ndarray, pred_xyz: jnp.ndarray) -> jnp.ndarray:
    """Align pred to target in similarity (sR, t) — reference :62-80."""
    tsl = jnp.mean(xyz, axis=1, keepdims=True)
    pred_tsl = jnp.mean(pred_xyz, axis=1, keepdims=True)
    xyz_c = xyz - tsl
    pred_c = pred_xyz - pred_tsl
    scale = jnp.linalg.norm(xyz_c.reshape(xyz.shape[0], -1), axis=1)[:, None, None] + 1e-8
    pred_scale = jnp.linalg.norm(pred_c.reshape(xyz.shape[0], -1), axis=1)[:, None, None] + 1e-8
    xyz_n = xyz_c / scale
    pred_n = pred_c / pred_scale
    R, s = orthogonal_procrustes(xyz_n, pred_n)
    aligned = jnp.einsum("bni,bji->bnj", pred_n, R) * s
    return aligned * scale + tsl


@LOSS.register_module
class AlignLoss(TensorLoss):
    def __init__(self, **cfg):
        super().__init__()
        self.lambda_procrustes_align = float(cfg.get("LAMBDA_PROCRUSTES_ALIGN", 1.0))

    def __call__(self, preds: Dict, targs: Dict, key=None) -> Tuple[jnp.ndarray, Dict]:
        final_loss, losses = jnp.zeros((), jnp.float32), {}
        targ = targs[Queries.JOINTS_3D] + targs[Queries.ROOT_JOINT][:, None]
        if self.lambda_procrustes_align:
            m = key_validity(targs, Queries.JOINTS_3D, Queries.ROOT_JOINT)
            if m is not None:
                # union-batch samples without joint annot: all-zero targets
                # would hit a degenerate SVD (NaN grads) — substitute the
                # (detached) prediction so alignment is exact and the
                # masked residual is zero
                sub = jax.lax.stop_gradient(preds["joints_3d_abs"])
                targ = jnp.where(m[:, None, None] > 0, targ, sub)
            aligned = procrustes_align(targ, preds["joints_3d_abs"])
            per_sample = jnp.mean((aligned - targ) ** 2, axis=(1, 2))
            procrustes_aligned_loss = masked_sample_mean(per_sample, m)
            final_loss = final_loss + self.lambda_procrustes_align * procrustes_aligned_loss
            losses["procrustes_aligned_loss"] = procrustes_aligned_loss
        losses[self.output_key] = final_loss
        return final_loss, losses
