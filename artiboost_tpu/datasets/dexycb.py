"""DexYCB dataset loader (parity: ``anakin/datasets/dexycb.py``).

The reference wraps the external ``dex-ycb-toolkit``; here we read the
official DexYCB release directly (thin reimplementation)::

    {data_root}/DexYCB/{subject}/{scene}/{camera}/labels_{frame}.npz
    {data_root}/DexYCB/calibration/...

Split modes s0..s3 follow the toolkit's subject/scene partitions; we
implement s0 (the one the reference configs use). Samples are filtered
to right-hand, visible, in-contact frames with a cache, mirroring
reference :83-105.
"""
from __future__ import annotations

import hashlib
import os
from typing import Dict, List

import cv2
import numpy as np
import yaml

from artiboost_tpu.datasets.hodata import HODataset
from artiboost_tpu.utils.logger import logger
from artiboost_tpu.utils.misc import CONST
from artiboost_tpu.utils.registry import DATASET

_S0_TEST_SEQ_SUFFIX = ("20200903", "20200908")  # held-out capture days (s0)


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
        self._load_annotations()

    def _load_annotations(self):
        ident = hashlib.md5(
            f"dexycb_{self.split_mode}_{self.data_split}_{self.mini_factor}".encode()
        ).hexdigest()[:10]
        cache = os.path.join("common", "cache", f"dexycb_{ident}.npz")
        if self.use_cache and os.path.isfile(cache):
            self.samples = list(np.load(cache, allow_pickle=True)["samples"])
            logger.info(f"{self.name}: {len(self.samples)} samples (cached)")
            return
        if not os.path.isdir(self.root):
            raise FileNotFoundError(f"DexYCB data not found under {self.root}")
        subjects = sorted(d for d in os.listdir(self.root) if d.startswith("2020"))
        for subj in subjects:
            subj_dir = os.path.join(self.root, subj)
            for scene in sorted(os.listdir(subj_dir)):
                is_test_day = any(scene.startswith(s) for s in _S0_TEST_SEQ_SUFFIX)
                if self.data_split == "train" and is_test_day:
                    continue
                if self.data_split == "test" and not is_test_day:
                    continue
                scene_dir = os.path.join(subj_dir, scene)
                meta_path = os.path.join(scene_dir, "meta.yml")
                if not os.path.isfile(meta_path):
                    continue
                with open(meta_path) as f:
                    meta = yaml.safe_load(f)
                if meta.get("mano_sides", ["right"])[0] != "right":
                    continue
                for cam in meta.get("serials", []):
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
        ``anakin/datasets/dexycb.py:83-105`` — the reference filters
        left-hand/invisible/no-contact with a cache; the filtered list is
        what lands in our npz cache). Contact uses the min hand-joint to
        object-bbox-corner distance against FILTER_THRESH (mm)."""
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
                can = self._corners_can_for_obj(
                    int(s["ycb_ids"][s["ycb_grasp_ind"]]))
                corners = can @ pose[:3, :3].T + pose[:3, 3]
                d_mm = np.linalg.norm(
                    j3d[:, None] - corners[None], axis=-1).min() * 1000.0
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

    def _corners_can_for_obj(self, obj_idx):
        # bbox corners of the grasped-object model (cached per object)
        if not hasattr(self, "_corner_cache"):
            self._corner_cache = {}
        if obj_idx not in self._corner_cache:
            name = CONST.YCB_IDX2CLASSES[obj_idx]
            from artiboost_tpu.artiboost.object_library import load_obj_file
            verts, _, _ = load_obj_file(
                os.path.join(self.root, "models", name, "textured_simple.obj"))
            lo, hi = verts.min(0), verts.max(0)
            center = (lo + hi) / 2
            self._corner_cache[obj_idx] = np.array([
                [x, y, z] for x in (lo[0], hi[0]) for y in (lo[1], hi[1])
                for z in (lo[2], hi[2])
            ], np.float32) - center
        return self._corner_cache[obj_idx]

    def get_corners_can(self, idx):
        return self._corners_can_for_obj(self.get_obj_idx(idx))

    def get_obj_transf(self, idx):
        s = self.samples[idx]
        labels = self._labels(idx)
        pose = np.asarray(labels["pose_y"], np.float32)[s["ycb_grasp_ind"]]  # (3, 4)
        transf = np.eye(4, dtype=np.float32)
        transf[:3] = pose
        return transf

    def get_obj_idx(self, idx):
        s = self.samples[idx]
        return int(s["ycb_ids"][s["ycb_grasp_ind"]])
