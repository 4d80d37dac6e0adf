"""DexYCB dataset loader (parity: ``anakin/datasets/dexycb.py``).

The reference wraps the external ``dex-ycb-toolkit``; here we read the
official DexYCB release directly (thin reimplementation)::

    {data_root}/DexYCB/{subject}/{scene}/{camera}/labels_{frame}.npz
    {data_root}/DexYCB/calibration/...

Split modes follow the toolkit's published s0–s3 setups. Subjects are the
sorted subject directories, a subject's sequences are its sorted scene
directories (100 per subject in the release: 20 objects x 5 trials, the
i-th sequence grasping object i//5), and camera-serial order is the
sorted serial list (the toolkit's ``_SERIALS`` constant is ascending):

- ``s0`` (default, seen everything): train keeps sequences with
  ``i % 5 != 4``; val = subjects {0,1} / test = subjects {2..9} on the
  ``i % 5 == 4`` sequences.
- ``s1`` (unseen subjects): train subjects {0,1,2,3,4,5,9}, val {6},
  test {7,8}.
- ``s2`` (unseen camera views): train serials {0..5}, val {6}, test {7}.
- ``s3`` (unseen grasped objects): train sequences with
  ``i//5 not in {3,7,11,15,19}``, val ``i//5 in {3,19}``,
  test ``i//5 in {7,11,15}``.

Samples are filtered to right-hand, visible, in-contact frames with a
cache, mirroring reference :83-105 (contact = min distance between
transformed object vertices and hand joints; falls back to the object's
bbox corners when the YCB models are absent). MANO hand verts follow the
reference (:211-218): PCA-45 / flat_hand_mean=False FK of
``pose_m[:48]`` plus the ``pose_m[48:]`` translation, betas from the
subject's mano calibration file.
"""
from __future__ import annotations

import hashlib
import os
from typing import Dict, List, Optional

import cv2
import numpy as np
import yaml

from artiboost_tpu.datasets.hodata import HODataset
from artiboost_tpu.mano.model import get_mano_model
from artiboost_tpu.mano.numpy_fk import NumpyMano
from artiboost_tpu.utils.logger import logger
from artiboost_tpu.utils.misc import CONST
from artiboost_tpu.utils.registry import DATASET

# (subject_ind, serial_ind, sequence_pred) per (setup, split); None = all
_SPLITS = {
    ("s0", "train"): (None, None, lambda i: i % 5 != 4),
    ("s0", "val"): ({0, 1}, None, lambda i: i % 5 == 4),
    ("s0", "test"): (set(range(2, 10)), None, lambda i: i % 5 == 4),
    ("s1", "train"): ({0, 1, 2, 3, 4, 5, 9}, None, None),
    ("s1", "val"): ({6}, None, None),
    ("s1", "test"): ({7, 8}, None, None),
    ("s2", "train"): (None, set(range(6)), None),
    ("s2", "val"): (None, {6}, None),
    ("s2", "test"): (None, {7}, None),
    ("s3", "train"): (None, None, lambda i: i // 5 not in (3, 7, 11, 15, 19)),
    ("s3", "val"): (None, None, lambda i: i // 5 in (3, 19)),
    ("s3", "test"): (None, None, lambda i: i // 5 in (7, 11, 15)),
}


@DATASET.register_module
class DexYCB(HODataset):
    def __init__(self, **cfg):
        super().__init__(**cfg)
        self.name = "DexYCB"
        self.split_mode = cfg.get("SPLIT_MODE", "s0")
        self.use_left_hand = bool(cfg.get("USE_LEFT_HAND", False))
        self.filter_invisible_hand = bool(cfg.get("FILTER_INVISIBLE_HAND", True))
        self.raw_size = (640, 480)
        self.root = os.path.join(self.data_root, "DexYCB")
        self.samples: List[Dict] = []
        self._mano: Optional[NumpyMano] = None
        self._betas_cache: Dict[str, np.ndarray] = {}
        self._load_annotations()

    @property
    def mano(self) -> NumpyMano:
        if self._mano is None:
            self._mano = NumpyMano(get_mano_model(), use_pca=True, ncomps=45,
                                   flat_hand_mean=False)
        return self._mano

    def _load_annotations(self):
        if (self.split_mode, self.data_split) not in _SPLITS:
            raise ValueError(f"unknown DexYCB split {self.split_mode}/"
                             f"{self.data_split}")
        subj_keep, serial_keep, seq_pred = _SPLITS[self.split_mode,
                                                   self.data_split]
        ident = hashlib.md5(
            f"dexycb_{self.split_mode}_{self.data_split}_{self.mini_factor}_"
            f"{self.filter_no_contact}_{self.filter_thresh}".encode()
        ).hexdigest()[:10]
        cache = os.path.join("common", "cache", f"dexycb_{ident}.npz")
        if self.use_cache and os.path.isfile(cache):
            self.samples = list(np.load(cache, allow_pickle=True)["samples"])
            logger.info(f"{self.name}: {len(self.samples)} samples (cached)")
            return
        if not os.path.isdir(self.root):
            raise FileNotFoundError(f"DexYCB data not found under {self.root}")
        subjects = sorted(d for d in os.listdir(self.root) if d.startswith("2020"))
        for subj_idx, subj in enumerate(subjects):
            if subj_keep is not None and subj_idx not in subj_keep:
                continue
            subj_dir = os.path.join(self.root, subj)
            scenes = sorted(s for s in os.listdir(subj_dir)
                            if os.path.isdir(os.path.join(subj_dir, s)))
            for seq_idx, scene in enumerate(scenes):
                if seq_pred is not None and not seq_pred(seq_idx):
                    continue
                scene_dir = os.path.join(subj_dir, scene)
                meta_path = os.path.join(scene_dir, "meta.yml")
                if not os.path.isfile(meta_path):
                    continue
                with open(meta_path) as f:
                    meta = yaml.safe_load(f)
                if not self.use_left_hand and \
                        meta.get("mano_sides", ["right"])[0] != "right":
                    continue
                serials = sorted(meta.get("serials", []))
                for serial_idx, cam in enumerate(serials):
                    if serial_keep is not None and serial_idx not in serial_keep:
                        continue
                    cam_dir = os.path.join(scene_dir, cam)
                    if not os.path.isdir(cam_dir):
                        continue
                    for fname in sorted(os.listdir(cam_dir)):
                        if fname.startswith("labels_") and fname.endswith(".npz"):
                            frame = fname[len("labels_"):-len(".npz")]
                            self.samples.append({
                                "labels": os.path.join(cam_dir, fname),
                                "img": os.path.join(cam_dir, f"color_{frame}.jpg"),
                                "ycb_grasp_ind": meta.get("ycb_grasp_ind", 0),
                                "ycb_ids": meta.get("ycb_ids", [1]),
                                "cam": cam,
                                "mano_calib": (meta.get("mano_calib") or [None])[0],
                                "side": meta.get("mano_sides", ["right"])[0],
                            })
        self._filter_samples()
        if self.mini_factor < 1.0:
            self.samples = self.samples[::int(1.0 / self.mini_factor)]
        if self.use_cache:
            os.makedirs(os.path.dirname(cache), exist_ok=True)
            np.savez_compressed(cache, samples=np.asarray(self.samples, dtype=object))
        logger.info(f"{self.name}: {len(self.samples)} samples")

    def _filter_samples(self):
        """Drop invisible-hand and no-contact frames (parity:
        ``anakin/datasets/dexycb.py:83-105``). Contact uses the min
        distance between transformed object vertices (bbox corners when
        the YCB models are absent) and the hand joints, in mm."""
        if not (self.filter_invisible_hand or self.filter_no_contact):
            return
        keep = []
        for i, s in enumerate(self.samples):
            lab = np.load(s["labels"])
            j3d = np.asarray(lab["joint_3d"], np.float32).reshape(21, 3)
            if self.filter_invisible_hand and np.all(j3d == -1):
                continue
            if self.filter_no_contact and self.filter_thresh > 0:
                pose = np.asarray(lab["pose_y"], np.float32)[s["ycb_grasp_ind"]]
                can = self._obj_pts_for_contact(
                    int(s["ycb_ids"][s["ycb_grasp_ind"]]))
                pts = can @ pose[:3, :3].T + pose[:3, 3]
                d_mm = np.linalg.norm(
                    j3d[:, None] - pts[None], axis=-1).min() * 1000.0
                if d_mm > self.filter_thresh:
                    continue
            keep.append(i)
        dropped = len(self.samples) - len(keep)
        if dropped:
            logger.info(f"{self.name}: contact/visibility filter dropped "
                        f"{dropped}/{len(self.samples)} frames")
        self.samples = [self.samples[i] for i in keep]

    def _labels(self, idx):
        return np.load(self.samples[idx]["labels"])

    def __len__(self):
        return len(self.samples)

    def get_image(self, idx):
        img = cv2.imread(self.samples[idx]["img"])
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def get_cam_intr(self, idx):
        # DexYCB intrinsics live per-camera in calibration; labels carry none,
        # so cache them from calibration yml on first access
        cam = self.samples[idx]["cam"]
        if not hasattr(self, "_intr_cache"):
            self._intr_cache = {}
        if cam not in self._intr_cache:
            calib = os.path.join(self.root, "calibration",
                                 f"intrinsics/{cam}_640x480.yml")
            with open(calib) as f:
                y = yaml.safe_load(f)["color"]
            self._intr_cache[cam] = np.array(
                [[y["fx"], 0, y["ppx"]], [0, y["fy"], y["ppy"]], [0, 0, 1]], np.float32)
        return self._intr_cache[cam]

    def get_joints_3d(self, idx):
        return np.asarray(self._labels(idx)["joint_3d"], np.float32).reshape(21, 3)

    def get_corners_3d(self, idx):
        transf = self.get_obj_transf(idx)
        can = self.get_corners_can(idx)
        return can @ transf[:3, :3].T + transf[:3, 3]

    def _obj_verts_for_obj(self, obj_idx) -> Optional[np.ndarray]:
        """Raw model vertices of a YCB object, or None when absent."""
        if not hasattr(self, "_verts_cache"):
            self._verts_cache = {}
        if obj_idx not in self._verts_cache:
            name = CONST.YCB_IDX2CLASSES[obj_idx]
            root = getattr(self, "root", None)
            path = os.path.join(root or "", "models", name, "textured_simple.obj")
            if root is None or not os.path.isfile(path):
                self._verts_cache[obj_idx] = None
            else:
                from artiboost_tpu.artiboost.object_library import load_obj_file
                verts, _, _ = load_obj_file(path)
                self._verts_cache[obj_idx] = np.asarray(verts, np.float32)
        return self._verts_cache[obj_idx]

    def _obj_pts_for_contact(self, obj_idx) -> np.ndarray:
        verts = self._obj_verts_for_obj(obj_idx)
        if verts is not None:
            return verts
        return self._corners_can_for_obj(obj_idx)

    def _corners_can_for_obj(self, obj_idx):
        # bbox corners of the grasped-object model (cached per object)
        if not hasattr(self, "_corner_cache"):
            self._corner_cache = {}
        if obj_idx not in self._corner_cache:
            verts = self._obj_verts_for_obj(obj_idx)
            if verts is None:
                raise FileNotFoundError(
                    f"YCB model for object {obj_idx} not found under "
                    f"{os.path.join(self.root, 'models')}")
            lo, hi = verts.min(0), verts.max(0)
            center = (lo + hi) / 2
            self._corner_cache[obj_idx] = np.array([
                [x, y, z] for x in (lo[0], hi[0]) for y in (lo[1], hi[1])
                for z in (lo[2], hi[2])
            ], np.float32) - center
        return self._corner_cache[obj_idx]

    def get_corners_can(self, idx):
        return self._corners_can_for_obj(self.get_obj_idx(idx))

    def get_obj_verts_can(self, idx):
        verts = self._obj_verts_for_obj(self.get_obj_idx(idx))
        if verts is None:
            return None
        center = (verts.min(0) + verts.max(0)) / 2.0
        return (verts - center).astype(np.float32)

    def get_obj_transf(self, idx):
        """Canonical (bbox-centered) frame -> camera: the center offset
        folds into the translation (reference dexycb.py:257-269). When
        the YCB models are absent the offset degrades to zero."""
        s = self.samples[idx]
        labels = self._labels(idx)
        pose = np.asarray(labels["pose_y"], np.float32)[s["ycb_grasp_ind"]]  # (3, 4)
        verts = self._obj_verts_for_obj(self.get_obj_idx(idx))
        offset = np.zeros(3, np.float32) if verts is None else \
            ((verts.min(0) + verts.max(0)) / 2.0).astype(np.float32)
        transf = np.eye(4, dtype=np.float32)
        transf[:3, :3] = pose[:3, :3]
        transf[:3, 3] = pose[:3, :3] @ offset + pose[:3, 3]
        return transf

    def get_obj_idx(self, idx):
        s = self.samples[idx]
        return int(s["ycb_ids"][s["ycb_grasp_ind"]])

    # ---- MANO annotations (reference :211-218) ----
    def _mano_betas(self, idx) -> np.ndarray:
        calib = self.samples[idx].get("mano_calib")
        if calib is None:
            return np.zeros(10, np.float32)
        if calib not in self._betas_cache:
            path = os.path.join(self.root, "calibration", f"mano_{calib}",
                                "mano.yml")
            if os.path.isfile(path):
                with open(path) as f:
                    betas = np.asarray(yaml.safe_load(f)["betas"], np.float32)
            else:
                betas = np.zeros(10, np.float32)
            self._betas_cache[calib] = betas
        return self._betas_cache[calib]

    def _pose_m(self, idx) -> Optional[np.ndarray]:
        if self.samples[idx].get("side", "right") != "right":
            return None  # left-hand FK needs the left MANO model
        lab = self._labels(idx)
        if "pose_m" not in lab.files:
            return None
        return np.asarray(lab["pose_m"], np.float32).reshape(-1)  # (51,)

    def get_hand_shape(self, idx):
        if self._pose_m(idx) is None:
            return None
        return self._mano_betas(idx)

    def get_hand_pose(self, idx):
        """(48,) full axis-angle decoded from the PCA-45 label pose."""
        pose_m = self._pose_m(idx)
        if pose_m is None:
            return None
        return self.mano.full_pose(pose_m[:48])

    def get_hand_verts_3d(self, idx):
        pose_m = self._pose_m(idx)
        if pose_m is None:
            return None
        verts, _ = self.mano(pose_m[:48], self._mano_betas(idx))
        return (verts + pose_m[48:]).astype(np.float32)

    def get_sides(self, idx):
        return self.samples[idx].get("side", "right")
