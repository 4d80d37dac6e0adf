"""Symmetry-aware corner loss (parity:
``anakin/criterions/symcornerloss.py:18-103``): min-over-symmetries MSE
between predicted corners and every symmetry-transformed GT corner set.
Symmetry transforms are precomputed into padded (R, t, valid) tensors,
so the min is one masked reduction on device.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from artiboost_tpu.criterions.criterion import TensorLoss
from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.utils.batching import key_validity, masked_sample_mean
from artiboost_tpu.utils.bop_sym import build_sym_tensor, default_ycb_model_info
from artiboost_tpu.utils.registry import LOSS

# HO3D's YCB models live in an OpenGL-flipped frame (reference :71-77)
_CAM_EXTR = np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]], dtype=np.float32)


@LOSS.register_module
class SymCornerLoss(TensorLoss):
    def __init__(self, **cfg):
        super().__init__()
        self.lambda_sym_corners_3d = float(cfg.get("LAMBDA_SYM_CORNERS_3D", 0.0))
        self.use_ho3d_ycb = cfg.get("USE_HO3D_YCB", False)
        info = cfg.get("MODEL_INFO_PATH") or default_ycb_model_info()
        R, t, valid = build_sym_tensor(info, cfg.get("MAX_SYM_DISC_STEP", 0.01))
        self.sym_R = jnp.asarray(R)        # (N, S, 3, 3)
        self.sym_t = jnp.asarray(t[..., 0])  # (N, S, 3)
        self.sym_valid = jnp.asarray(valid)  # (N, S)

    def __call__(self, preds: Dict, targs: Dict, key=None) -> Tuple[jnp.ndarray, Dict]:
        final_loss, losses = jnp.zeros((), jnp.float32), {}
        if self.lambda_sym_corners_3d:
            obj_idx = targs[Queries.OBJ_IDX].astype(jnp.int32) - 1  # (B,)
            sym_R = self.sym_R[obj_idx]      # (B, S, 3, 3)
            sym_t = self.sym_t[obj_idx]      # (B, S, 3)
            sym_valid = self.sym_valid[obj_idx]  # (B, S)

            corners_can = targs[Queries.CORNERS_CAN]  # (B, 8, 3)
            obj_transf = targs[Queries.OBJ_TRANSF]    # (B, 4, 4)

            if not self.use_ho3d_ycb:
                sym_corners_can = (
                    jnp.einsum("bsmn,bcn->bscm", sym_R, corners_can) + sym_t[:, :, None]
                )  # (B, S, 8, 3)
            else:
                flipped = jnp.einsum("mn,bcn->bcm", _CAM_EXTR, corners_can)
                sym_c = jnp.einsum("bsmn,bcn->bscm", sym_R, flipped) + sym_t[:, :, None]
                sym_corners_can = jnp.einsum("mn,bscn->bscm", _CAM_EXTR, sym_c)

            sym_corners_abs = (
                jnp.einsum("bij,bscj->bsci", obj_transf[:, :3, :3], sym_corners_can)
                + obj_transf[:, None, None, :3, 3]
            )  # (B, S, 8, 3)

            vis = targs[Queries.CORNERS_VIS]
            m = key_validity(targs, Queries.OBJ_TRANSF, Queries.CORNERS_CAN,
                             Queries.OBJ_IDX)
            if m is not None:  # union-batch samples without pose annot.
                vis = vis * m[:, None]
            pred = preds["corners_3d_abs"] * vis[..., None]
            sym_corners_abs = sym_corners_abs * vis[:, None, :, None]

            per_sym = jnp.mean((sym_corners_abs - pred[:, None]) ** 2, axis=(2, 3))  # (B, S)
            big = jnp.asarray(jnp.finfo(per_sym.dtype).max, per_sym.dtype)
            per_sym = jnp.where(sym_valid > 0, per_sym, big)
            sym_corners_3d_loss = masked_sample_mean(jnp.min(per_sym, axis=1), m)

            final_loss = final_loss + self.lambda_sym_corners_3d * sym_corners_3d_loss
            losses["sym_corners_3d_loss"] = sym_corners_3d_loss
        losses[self.output_key] = final_loss
        return final_loss, losses
