"""Test-time BOP metric: symmetry-aware MSSD averaged per object, plus
the BOP average-recalls (parity: ``anakin/metrics/bopAR.py:16-190``; the
AR-over-thresholds extension follows the BOP challenge definition —
AR_MSSD at 0.05..0.5 diameter, AR_MSPD at 5..50 px scaled by w/640).
MSPD convention caveat: errors are measured in CROP pixel space with the
crop-adjusted intrinsics and thresholds scaled by IMAGE_SIZE/640 — see
``val_metric.mspd_values`` for why this deviates from BOP's source-image
definition and what would make it strict.
VSD (``USE_VSD: true``, off by default) is an extension BEYOND the
reference — its vendored bop_toolkit VSD path is dead code — computed
from point-splat distance maps with object-only visibility; the two
approximations vs strict BOP (no mesh render, no test-scene occlusion
masking) are documented at ``val_metric.vsd_values``. AR_BOP averages
all three recalls when VSD is on.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.metrics.metric import AverageMeter, Metric
from artiboost_tpu.metrics.val_metric import (mspd_values, mssd_values,
                                              vsd_values)
from artiboost_tpu.utils.bop_sym import build_sym_tensor, default_ycb_model_info
from artiboost_tpu.utils.registry import METRIC


@METRIC.register_module
class AR(Metric):
    def __init__(self, **cfg) -> None:
        super().__init__()
        if not cfg.get("USE_MSSD", True):
            raise NotImplementedError("only MSSD-based AR is supported")
        self.mssd_use_corners = cfg.get("MSSD_USE_CORNERS", False)
        self.use_ho3d_ycb = cfg.get("USE_HO3D_YCB", False)
        self.use_mspd = cfg.get("USE_MSPD", True)
        self.use_vsd = cfg.get("USE_VSD", False)
        self.vsd_res = int(cfg.get("VSD_RES", 64))
        self.vsd_dilate = int(cfg.get("VSD_DILATE", 2))
        data_preset = cfg.get("DATA_PRESET", {}) or {}
        self.image_width = float(
            (data_preset.get("IMAGE_SIZE") or [224, 224])[0])
        self.center_idx: Optional[int] = (
            data_preset.get("CENTER_IDX") if cfg.get("MSSD_USE_CENTER_IDX", False) else None
        )
        info = cfg.get("MODEL_INFO_PATH") or default_ycb_model_info()
        R, t, valid = build_sym_tensor(info, cfg.get("MAX_SYM_DISC_STEP", 0.01))
        self.n_obj = R.shape[0]
        self.sym_R = jnp.asarray(R)
        self.sym_t = jnp.asarray(t[..., 0])
        self.sym_valid = jnp.asarray(valid)
        # diameters (meters) for recall thresholds; models_info carries mm
        if isinstance(info, dict) and "diameter" in info.get("1", {}):
            self.diameters = np.array(
                [info[str(i)]["diameter"] / 1000.0 for i in range(1, self.n_obj + 1)], np.float32)
        else:
            self.diameters = np.full((self.n_obj,), 0.2, np.float32)
        # device constants built ONCE (per-feed host constants would cost
        # a ~20 ms tunnel upload each — see metrics/ conventions)
        self._tau_grid = jnp.linspace(0.05, 0.5, 10)
        self._diam_dev = jnp.asarray(self.diameters)
        self.reset()

    _FOLD = 64  # device chunks per host fold (fixed width keeps the
    # concat executable cached; one fetch per _FOLD feeds)

    def reset(self):
        self.count = 0
        # per-sample MSSD/MSPD values stay ON DEVICE as deferred chunks
        # (no blocking fetch per feed); folded to host every _FOLD feeds
        self._errors: List[jnp.ndarray] = []
        self._errors_px: List[jnp.ndarray] = []
        self._errors_vsd: List[jnp.ndarray] = []
        self._err_obj: List[jnp.ndarray] = []
        self._host_errors: List[np.ndarray] = []
        self._host_errors_px: List[np.ndarray] = []
        self._host_errors_vsd: List[np.ndarray] = []
        self._host_obj: List[np.ndarray] = []
        self._ones_pad = None

    def feed(self, preds: Dict, targs: Dict, **kwargs):
        # everything stays on device: np.asarray here would cost a
        # blocking fetch + re-upload round-trip per feed
        obj_idx = jnp.asarray(targs[Queries.OBJ_IDX]).astype(jnp.int32)
        if Queries.SAMPLE_VALID in targs:
            # repeat-padded eval-tail rows: obj id -1 drops them on host
            valid = jnp.asarray(targs[Queries.SAMPLE_VALID]) > 0
            obj_idx = jnp.where(valid, obj_idx, -1)
        obj_can = (
            targs[Queries.CORNERS_CAN] if self.mssd_use_corners else targs[Queries.OBJ_VERTS_CAN]
        )
        pad = targs.get(Queries.PADDING_MASK)
        if pad is None or self.mssd_use_corners:
            if self._ones_pad is None or self._ones_pad.shape != obj_can.shape[:2]:
                self._ones_pad = jnp.ones(obj_can.shape[:2], jnp.float32)
            pad = self._ones_pad  # cached: one upload, not one per feed
        gather = jnp.maximum(obj_idx - 1, 0)
        vals_m = mssd_values(
            preds["box_rot_rotmat"],
            preds["boxroot_3d_abs"].reshape(-1, 1, 3),
            obj_can, pad,
            targs[Queries.OBJ_TRANSF],
            self.sym_R[gather], self.sym_t[gather], self.sym_valid[gather],
            self.use_ho3d_ycb,
        )
        self._errors.append(vals_m)
        if self.use_mspd and Queries.CAM_INTR in targs:
            vals_px = mspd_values(
                preds["box_rot_rotmat"],
                preds["boxroot_3d_abs"].reshape(-1, 1, 3),
                obj_can, pad,
                targs[Queries.OBJ_TRANSF],
                jnp.asarray(targs[Queries.CAM_INTR]),
                self.sym_R[gather], self.sym_t[gather], self.sym_valid[gather],
                self.use_ho3d_ycb,
            )
        else:
            vals_px = jnp.full(vals_m.shape, jnp.nan, vals_m.dtype)
        self._errors_px.append(vals_px)
        if self.use_vsd and Queries.CAM_INTR in targs:
            # VSD always uses the vertex cloud (corners can't splat a
            # surface); taus = (0.05..0.5) x object diameter per BOP19
            vsd_can = targs.get(Queries.OBJ_VERTS_CAN, obj_can)
            vsd_pad = targs.get(Queries.PADDING_MASK)
            if vsd_pad is None:
                vsd_pad = jnp.ones(vsd_can.shape[:2], jnp.float32)
            taus = self._diam_dev[gather][:, None] * self._tau_grid[None]
            vals_vsd = vsd_values(
                preds["box_rot_rotmat"],
                preds["boxroot_3d_abs"].reshape(-1, 1, 3),
                vsd_can, vsd_pad,
                targs[Queries.OBJ_TRANSF],
                jnp.asarray(targs[Queries.CAM_INTR]), taus,
                self.image_width, res=self.vsd_res, dilate=self.vsd_dilate,
            )
        else:
            vals_vsd = jnp.full((vals_m.shape[0], 10), jnp.nan, vals_m.dtype)
        self._errors_vsd.append(vals_vsd)
        self._err_obj.append(obj_idx)
        self.count += int(vals_m.shape[0])
        if len(self._errors) >= self._FOLD:
            self._fold()

    def _fold(self):
        if not self._errors:
            return
        self._host_errors.append(np.asarray(jnp.concatenate(self._errors)))
        self._host_errors_px.append(
            np.asarray(jnp.concatenate(self._errors_px)))
        self._host_errors_vsd.append(
            np.asarray(jnp.concatenate(self._errors_vsd)))
        self._host_obj.append(np.asarray(jnp.concatenate(self._err_obj)))
        self._errors, self._errors_px, self._err_obj = [], [], []
        self._errors_vsd = []

    def _collect(self):
        """-> (errors (N,), errors_px (N,), errors_vsd (N, 10),
        obj_idx (N,)) on host; padded rows dropped."""
        self._fold()
        if not self._host_errors:
            z = np.zeros((0,), np.float32)
            return z, z, np.zeros((0, 10), np.float32), np.zeros((0,), np.int32)
        errors = np.concatenate(self._host_errors)
        errors_px = np.concatenate(self._host_errors_px)
        errors_vsd = np.concatenate(self._host_errors_vsd)
        obj = np.concatenate(self._host_obj)
        keep = obj >= 0
        return errors[keep], errors_px[keep], errors_vsd[keep], obj[keep]

    @property
    def objs_error(self) -> Dict[int, AverageMeter]:
        """Host view of per-object meters (fetches; epoch-boundary use)."""
        errors, _, _, obj = self._collect()
        out = {i + 1: AverageMeter() for i in range(self.n_obj)}
        for i in range(1, self.n_obj + 1):
            e = errors[obj == i]
            if e.size:
                out[i].update(float(e.sum()), n=int(e.size))
        return out

    @property
    def avg(self) -> float:
        errors, _, _, _ = self._collect()
        return float(errors.sum()) / max(errors.size, 1) * 1000.0  # mm

    def get_measures(self, **kwargs) -> Dict[str, float]:
        errors, errors_px, errors_vsd, obj = self._collect()
        measures = {"MSSD": float(errors.sum()) / max(errors.size, 1) * 1000.0}
        for idx in range(1, self.n_obj + 1):
            e = errors[obj == idx]
            if e.size:
                measures[f"MSSD_obj_{idx}"] = float(e.mean()) * 1000.0
        # BOP ARs: mean recall over the challenge threshold grids
        if errors.size:
            diam = self.diameters[obj - 1]
            thetas = np.linspace(0.05, 0.5, 10)
            recalls = [(errors < th * diam).mean() for th in thetas]
            measures["AR_MSSD"] = float(np.mean(recalls))
            has_px = np.isfinite(errors_px)
            if has_px.any():
                px = errors_px[has_px]
                measures["MSPD"] = float(px.mean())
                # BOP: r = 5..50 px at 640-wide images, scaled by w/640
                rs = np.linspace(5, 50, 10) * (self.image_width / 640.0)
                recalls_px = [(px < r).mean() for r in rs]
                measures["AR_MSPD"] = float(np.mean(recalls_px))
                # without VSD this is the 2-term mean; with USE_VSD the
                # full BOP-core 3-term AR is reported as AR_BOP below
                measures["AR_BOP2"] = float(
                    (measures["AR_MSSD"] + measures["AR_MSPD"]) / 2.0)
            has_vsd = np.isfinite(errors_vsd).all(axis=1)
            if has_vsd.any():
                e = errors_vsd[has_vsd]  # (N, 10 taus)
                measures["VSD"] = float(e.mean())
                # BOP19 recall grid: theta in 0.05..0.5 x tau in
                # (0.05..0.5) x diameter (already baked into e's columns)
                thetas = np.linspace(0.05, 0.5, 10)
                measures["AR_VSD"] = float(
                    (e[:, :, None] < thetas[None, None, :]).mean())
                if "AR_MSPD" in measures:
                    measures["AR_BOP"] = float(np.mean(
                        [measures["AR_VSD"], measures["AR_MSSD"],
                         measures["AR_MSPD"]]))
        return measures

    def __str__(self) -> str:
        return f"mssd: {self.avg:6.4f}mm"
