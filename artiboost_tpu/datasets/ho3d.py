"""HO3D v2/v3 dataset loaders (parity: ``anakin/datasets/ho3d.py``).

Reads the official HO3D release layout::

    {data_root}/HO3D{_v3}/{train|evaluation}/{seq}/meta/{frame}.pkl
                                     .../rgb/{frame}.{png|jpg}

Split modes (reference :79-96): "v1" (official train/eval), "paper"
(train sequences minus val seqs used as val), "v2". Annotations cache to
a npz per (split, mode) so repeated runs skip the per-frame pkl sweep.
The OpenGL-style flip (y/z negation) of HO3D annotations is applied on
load, as in the reference (:415-440).
"""
from __future__ import annotations

import hashlib
import os
import pickle
from typing import Dict, List, Optional

import cv2
import numpy as np

from artiboost_tpu.datasets.hodata import HODataset
from artiboost_tpu.utils.logger import logger
from artiboost_tpu.utils.misc import CONST
from artiboost_tpu.utils.registry import DATASET

_CAM_EXTR = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32)

# validation sequences of the "paper" split (reference ho3dutils)
_PAPER_VAL_SEQS = ("SM1", "MC2")


@DATASET.register_module
class HO3D(HODataset):
    version = "v2"

    def __init__(self, **cfg):
        super().__init__(**cfg)
        self.name = f"HO3D_{self.version}"
        self.split_mode = cfg.get("SPLIT_MODE", "paper")
        self.raw_size = (640, 480)
        self.rgb_ext = ".png" if self.version == "v2" else ".jpg"
        root_name = "HO3D" if self.version == "v2" else "HO3D_v3"
        self.root = os.path.join(self.data_root, root_name)
        self.samples: List[Dict] = []
        self._load_annotations()

    # ------------------------------------------------------------------
    def _seq_dirs(self):
        split_dir = "train" if self.data_split in ("train", "trainval", "val") \
            else "evaluation"
        base = os.path.join(self.root, split_dir)
        if not os.path.isdir(base):
            raise FileNotFoundError(f"HO3D data not found under {base}")
        seqs = sorted(os.listdir(base))
        if self.split_mode == "paper" and split_dir == "train":
            if self.data_split == "val":
                seqs = [s for s in seqs if s in _PAPER_VAL_SEQS]
            elif self.data_split == "train":
                seqs = [s for s in seqs if s not in _PAPER_VAL_SEQS]
        return split_dir, base, seqs

    def _cache_path(self):
        ident = hashlib.md5(
            f"{self.version}_{self.data_split}_{self.split_mode}_{self.mini_factor}"
            .encode()).hexdigest()[:10]
        return os.path.join("common", "cache", f"ho3d_{ident}.npz")

    def _load_annotations(self):
        cache = self._cache_path()
        if self.use_cache and os.path.isfile(cache):
            blob = np.load(cache, allow_pickle=True)
            self.samples = list(blob["samples"])
            logger.info(f"{self.name}: {len(self.samples)} samples (cached)")
            return
        split_dir, base, seqs = self._seq_dirs()
        for seq in seqs:
            meta_dir = os.path.join(base, seq, "meta")
            for fname in sorted(os.listdir(meta_dir)):
                with open(os.path.join(meta_dir, fname), "rb") as f:
                    meta = pickle.load(f)
                frame = os.path.splitext(fname)[0]
                if meta.get("handJoints3D") is None:
                    continue
                self.samples.append({
                    "img": os.path.join(base, seq, "rgb", frame + self.rgb_ext),
                    "meta": meta,
                })
        if self.mini_factor < 1.0:
            step = int(1.0 / self.mini_factor)
            self.samples = self.samples[::step]
        if self.use_cache:
            os.makedirs(os.path.dirname(cache), exist_ok=True)
            np.savez_compressed(cache, samples=np.asarray(self.samples, dtype=object))
        logger.info(f"{self.name}: {len(self.samples)} samples")

    # ------------------------------------------------------------------
    def __len__(self):
        return len(self.samples)

    def get_image(self, idx):
        img = cv2.imread(self.samples[idx]["img"])
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def get_cam_intr(self, idx):
        return np.asarray(self.samples[idx]["meta"]["camMat"], np.float32)

    def get_joints_3d(self, idx):
        j = np.asarray(self.samples[idx]["meta"]["handJoints3D"], np.float32)
        if j.ndim == 1:  # evaluation split ships only the root joint
            j = np.tile(j[None], (CONST.NUM_JOINTS, 1))
        return j @ _CAM_EXTR.T

    def get_corners_3d(self, idx):
        c = np.asarray(self.samples[idx]["meta"]["objCorners3D"], np.float32)
        return c @ _CAM_EXTR.T

    def get_corners_can(self, idx):
        meta = self.samples[idx]["meta"]
        corners = np.asarray(meta["objCorners3DRest"], np.float32)
        return corners - (corners.min(0) + corners.max(0)) / 2.0

    def get_obj_transf(self, idx):
        meta = self.samples[idx]["meta"]
        rot = cv2.Rodrigues(np.asarray(meta["objRot"], np.float64).reshape(3))[0]
        transf = np.eye(4, dtype=np.float32)
        transf[:3, :3] = (_CAM_EXTR @ rot).astype(np.float32)
        transf[:3, 3] = (_CAM_EXTR @ np.asarray(meta["objTrans"], np.float32))
        return transf

    def get_obj_idx(self, idx):
        name = self.samples[idx]["meta"]["objName"]
        return CONST.YCB_CLASSES2IDX.get(name, 0)

    def get_sides(self, idx):
        return "right"


@DATASET.register_module
class HO3DV3(HO3D):
    version = "v3"
