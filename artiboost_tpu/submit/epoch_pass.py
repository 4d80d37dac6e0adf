"""Evaluation / Codalab-submission epoch pass.

Parity: ``anakin/submit/submit_epoch_pass.py`` +
``hodata_submit_epoch_pass.py`` — run the test split through the model,
feed the evaluator, and optionally dump HO3D-Codalab JSON (joint
reorder + axis flips, :129-156) zipped for upload, with optional MANO
mesh fitting and debug rendering.
"""
from __future__ import annotations

import json
import os
import zipfile
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.utils.logger import logger
from artiboost_tpu.utils.transform import MANO_TO_OPENPOSE_ORDER


class SubmitEpochPass:
    build_mapping = {}

    @staticmethod
    def build(cata: str, **cfg) -> "SubmitEpochPass":
        return SubmitEpochPass.build_mapping[cata](**cfg)

    @classmethod
    def register(cls, key):
        def deco(sub):
            cls.build_mapping[key] = sub
            return sub
        return deco


@SubmitEpochPass.register("hodata")
class HOSubmitEpochPass(SubmitEpochPass):
    def __init__(self, arg=None, fitting_unit=None, **cfg):
        self.dump = bool(getattr(arg, "submit_dump", False)) if arg else cfg.get("DUMP", False)
        self.fit_mesh = bool(getattr(arg, "postprocess_fit_mesh", False)) if arg \
            else cfg.get("FIT_MESH", False)
        self.fit_mesh_use_fitted_joints = bool(
            getattr(arg, "postprocess_fit_mesh_use_fitted_joints", False)) if arg else False
        self.fitting_unit = fitting_unit
        self.draw = bool(getattr(arg, "postprocess_draw", False)) if arg \
            else cfg.get("DRAW", False)
        self.draw_path = (getattr(arg, "postprocess_draw_path", None) if arg
                          else cfg.get("DRAW_PATH")) or "exp/draw"
        self.draw_max_batches = int(cfg.get("DRAW_MAX_BATCHES", 4))

    @staticmethod
    def get_order_idxs():
        reorder_idxs = list(MANO_TO_OPENPOSE_ORDER)
        unorder_idxs = np.argsort(reorder_idxs)
        return reorder_idxs, unorder_idxs

    def dump_json(self, pred_out_path: str, xyz_pred_list: List[np.ndarray],
                  verts_pred_list: List[np.ndarray], codalab: bool = True):
        """HO3D official format: json [joints[], verts[]] zipped."""

        def roundall(rows):
            return [[round(float(v), 5) for v in row] for row in rows]

        xyz = [roundall(np.asarray(x).tolist()) for x in xyz_pred_list]
        verts = [roundall(np.asarray(v).tolist()) for v in verts_pred_list]
        with open(pred_out_path, "w") as fo:
            json.dump([xyz, verts], fo)
        logger.info(f"dumped {len(xyz)} joints / {len(verts)} verts to {pred_out_path}")
        if codalab:
            zipped = pred_out_path.replace(".json", ".zip")
            with zipfile.ZipFile(zipped, "w", zipfile.ZIP_DEFLATED) as zf:
                zf.write(pred_out_path, os.path.basename(pred_out_path))
            logger.warning(f"finished — submit {zipped} to Codalab for evaluation")

    # box corner index = bit(x)*4 + bit(y)*2 + bit(z) (object_library
    # _bbox_corners order) -> the cuboid's 12 triangles
    BOX_TRIS = np.asarray(
        [(0, 1, 3), (0, 3, 2), (4, 5, 7), (4, 7, 6),
         (0, 1, 5), (0, 5, 4), (2, 3, 7), (2, 7, 6),
         (0, 2, 6), (0, 6, 4), (1, 3, 7), (1, 7, 5)], np.int32)

    def draw_batch(self, bidx: int, batch, preds, fitted_verts=None) -> None:
        """Save qualitative overlays for a batch (parity:
        ``anakin/submit/hodata_submit_epoch_pass.py:158-222``): SOLID
        shaded hand/object meshes rendered by the in-tree rasterizer on
        the host (replacing the reference's OpenDR renders), plus the
        skeleton / corner-cube annotation overlays."""
        from PIL import Image

        from artiboost_tpu.datasets.hoquery import Queries
        from artiboost_tpu.mano.model import get_mano_model
        from artiboost_tpu.viztools import (draw_corners_2d, draw_skeleton_2d,
                                            image_grid, project_points,
                                            render_mesh_overlay)

        os.makedirs(self.draw_path, exist_ok=True)
        imgs = np.asarray(batch[Queries.IMAGE]) + 0.5
        intr = np.asarray(batch[Queries.CAM_INTR])
        joints = np.asarray(preds["joints_3d_abs"])
        corners = np.asarray(preds.get("corners_3d_abs")) \
            if "corners_3d_abs" in preds else None
        tiles = []
        for i in range(min(imgs.shape[0], 16)):
            tile = Image.fromarray((imgs[i] * 255).clip(0, 255).astype(np.uint8))
            meshes = []
            if fitted_verts is not None:  # MANO skin tone (opendr_renderer)
                meshes.append((fitted_verts[i],
                               np.asarray(get_mano_model().faces),
                               (0.8, 0.62, 0.52)))
            if corners is not None:  # predicted object pose as a solid box
                meshes.append((corners[i], self.BOX_TRIS, (0.35, 0.6, 0.9)))
            if meshes:
                render_mesh_overlay(tile, meshes, intr[i])
            draw_skeleton_2d(tile, project_points(joints[i], intr[i]))
            if corners is not None:
                draw_corners_2d(tile, project_points(corners[i], intr[i]))
            tiles.append(np.asarray(tile))
        grid = image_grid(tiles, ncol=4)
        grid.save(os.path.join(self.draw_path, f"eval_batch_{bidx:04d}.png"))

    def __call__(self, epoch_idx: int, eval_step, state, data_loader, evaluator,
                 dump_path: Optional[str] = None, rng: Optional[jax.Array] = None):
        """Run eval; collect Codalab-ordered joints/verts if dumping."""
        _, unorder_idxs = self.get_order_idxs()
        res_joints: List[np.ndarray] = []
        res_verts: List[np.ndarray] = []
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        # host-CPU multi-device runs deadlock under unbounded async
        # dispatch (thread-pool rendezvous exhaustion); real TPU slices
        # pipeline freely (see train_artiboost.epoch_pass)
        cpu_mesh_sync = (jax.default_backend() == "cpu"
                         and len(jax.devices()) > 1)
        for bidx, batch in enumerate(data_loader):
            rng, sub = jax.random.split(rng)
            batch = {k: jnp.asarray(v) for k, v in batch.items()
                     if not isinstance(v, (str, list))}
            preds, losses = eval_step(state, batch, sub)
            evaluator.feed_all(preds, batch, losses)
            if cpu_mesh_sync:
                jax.block_until_ready(preds["joints_3d_abs"])

            if self.dump or self.fit_mesh or self.draw:
                pred_joints = np.asarray(preds["joints_3d_abs"])
                fitted_verts = None
                if self.fit_mesh and self.fitting_unit is not None:
                    fitted = self.fitting_unit(pred_joints, batch)
                    fitted_verts = np.asarray(fitted["hand_verts"])
                    if self.fit_mesh_use_fitted_joints:
                        pred_joints = np.asarray(fitted["joints"])
                if self.draw and bidx < self.draw_max_batches:
                    self.draw_batch(bidx, batch, preds, fitted_verts)
                if not (self.dump or self.fit_mesh):
                    continue
                # repeat-padded tail rows (static jit shapes) must not
                # reach the dump: Codalab expects exactly len(dataset)
                # entries (reference dumps per-sample,
                # hodata_submit_epoch_pass.py:129-156)
                n_valid = pred_joints.shape[0]
                if Queries.SAMPLE_VALID in batch:
                    n_valid = int(np.asarray(
                        batch[Queries.SAMPLE_VALID]).sum())
                # HO3D Codalab convention: MANO-native joint order, y/z flip
                pj = pred_joints[:n_valid, unorder_idxs]
                pj[:, :, 0] = -pj[:, :, 0]
                res_joints.extend([-p for p in pj])
                if fitted_verts is not None:
                    # parity quirk: the reference appends fitted verts RAW
                    # (camera frame, hodata_submit_epoch_pass.py:148-149)
                    # even though its joints get the (x,-y,-z) Codalab
                    # flip — submission-file fidelity means matching that
                    # asymmetry exactly, not "fixing" it
                    res_verts.extend([v for v in fitted_verts[:n_valid]])
                else:
                    res_verts.extend([np.zeros((778, 3))] * pj.shape[0])

        if self.dump and dump_path:
            self.dump_json(dump_path, res_joints, res_verts, codalab=True)
        return evaluator
