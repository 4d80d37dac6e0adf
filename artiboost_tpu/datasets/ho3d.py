"""HO3D v2/v3 dataset loaders (parity: ``anakin/datasets/ho3d.py``).

Reads the official HO3D release layout::

    {data_root}/HO3D{_v3}/{train|evaluation}/{seq}/meta/{frame}.pkl
                                     .../rgb/{frame}.{png|jpg}
    {data_root}/HO3D{_v3}/train.txt, evaluation.txt

Split modes (reference :78-96):

- ``"paper"``  — official Codalab split: train.txt / evaluation.txt frame
  lists (trainval cut at 6000 frames, reference ``_load_seq_frames``).
- ``"v1"``     — hand-picked sequence tables, everything under ``train/``
  (reference ``ho3dutils.get_v1_seqs``).
- ``"v2"``     — txt frames intersected with the v2 sequence tables
  (reference ``ho3dutils.get_v2_frames``).

When the official txt files are absent (synthetic stand-in fixtures) the
loader falls back to a directory sweep with the paper-val heuristic and
logs a warning.

Annotations cache to a npz per (split, mode, filter) so repeated runs
skip the per-frame pkl sweep. The OpenGL-style flip (y/z negation) of
HO3D annotations is applied on load, as in the reference (:415-440), and
``handJoints3D`` is reordered into the 21-kp MANO convention
(reference :41,274). MANO hand pose/shape/verts accessors run host
numpy FK (reference :253-262 uses a torch-CPU ManoLayer per access).
"""
from __future__ import annotations

import hashlib
import os
import pickle
from typing import Dict, List, Optional

import cv2
import numpy as np

from artiboost_tpu.datasets import ho3dutils
from artiboost_tpu.datasets.hodata import HODataset
from artiboost_tpu.mano.model import get_mano_model
from artiboost_tpu.mano.numpy_fk import NumpyMano, aa_to_rotmat_np, rotmat_to_aa_np
from artiboost_tpu.utils.logger import logger
from artiboost_tpu.utils.misc import CONST
from artiboost_tpu.utils.registry import DATASET
from artiboost_tpu.utils.transform import MANO_TO_OPENPOSE_ORDER

_CAM_EXTR = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32)

# validation sequences used by the directory-sweep fallback when the
# official train.txt is absent (fixture/stand-in mode)
_PAPER_VAL_SEQS = ("SM1", "MC2")

# HO3D annotation order -> 21-kp MANO convention (reference ho3d.py:41)
_REORDER = np.asarray(MANO_TO_OPENPOSE_ORDER, np.int64)


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
        self._mano: Optional[NumpyMano] = None
        self._obj_meshes: Optional[Dict] = None
        self._verts_can_cache: Dict[str, np.ndarray] = {}
        self._load_annotations()

    # ------------------------------------------------------------------
    @property
    def mano(self) -> NumpyMano:
        if self._mano is None:
            self._mano = NumpyMano(get_mano_model())
        return self._mano

    @property
    def obj_meshes(self) -> Dict[str, Dict[str, np.ndarray]]:
        """YCB meshes from {data_root}/YCB_models_supp (reference
        load_dataset :72); {} when the assets are absent."""
        if self._obj_meshes is None:
            self._obj_meshes = ho3dutils.load_ycb_obj_meshes(
                os.path.join(self.data_root, "YCB_models_supp"))
        return self._obj_meshes

    # ------------------------------------------------------------------
    def _dir_sweep_frames(self):
        """Fallback frame list from directory listing (no train.txt)."""
        split_dir = "train" if self.data_split in ("train", "trainval", "val") \
            else "evaluation"
        base = os.path.join(self.root, split_dir)
        if not os.path.isdir(base):
            raise FileNotFoundError(f"HO3D data not found under {base}")
        seqs = sorted(os.listdir(base))
        if split_dir == "train":
            if self.data_split == "val":
                seqs = [s for s in seqs if s in _PAPER_VAL_SEQS]
            elif self.data_split == "train" and self.split_mode == "paper":
                seqs = [s for s in seqs if s not in _PAPER_VAL_SEQS]
            if self.split_mode == "v2":
                known = ho3dutils.V2_TRAIN_SEQS if self.data_split != "test" \
                    else ho3dutils.V2_TEST_SEQS
                seqs = [s for s in seqs if s in known]
        out = []
        for seq in seqs:
            meta_dir = os.path.join(base, seq, "meta")
            if not os.path.isdir(meta_dir):
                continue
            for fname in sorted(os.listdir(meta_dir)):
                out.append((seq, os.path.splitext(fname)[0]))
        return out, split_dir

    def _seq_frames(self):
        """(seq, frame) list per split mode (reference load_dataset
        :78-96)."""
        if self.split_mode == "v1":
            seqs, subfolder = ho3dutils.get_v1_seqs(self.data_split)
            out = []
            for seq in sorted(seqs):
                meta_dir = os.path.join(self.root, subfolder, seq, "meta")
                if not os.path.isdir(meta_dir):
                    continue
                for fname in sorted(os.listdir(meta_dir)):
                    out.append((seq, os.path.splitext(fname)[0]))
            return out, subfolder
        try:
            if self.split_mode == "paper":
                return ho3dutils.read_split_txt(self.root, self.data_split,
                                                trainval_idx=6000)
            if self.split_mode == "v2":
                # v2 tables always index the HO3D(v2) txt files (reference
                # get_v2_frames: root.replace(name, "HO3D"))
                v2_root = os.path.join(self.data_root, "HO3D")
                return ho3dutils.get_v2_frames(
                    v2_root, self.data_split, trainval_idx=60000,
                    keep_original_order=(self.data_split == "test"))
        except FileNotFoundError:
            logger.warning(f"{self.name}: official split txt missing under "
                           f"{self.root}; falling back to directory sweep")
            return self._dir_sweep_frames()
        raise NotImplementedError(f"unknown split mode {self.split_mode!r}")

    def _cache_path(self):
        ident = hashlib.md5(
            f"{self.version}_{self.data_split}_{self.split_mode}_"
            f"{self.mini_factor}_{self.filter_no_contact}_{self.filter_thresh}"
            .encode()).hexdigest()[:10]
        return os.path.join("common", "cache", f"ho3d_{ident}.npz")

    def _load_annotations(self):
        cache = self._cache_path()
        if self.use_cache and os.path.isfile(cache):
            blob = np.load(cache, allow_pickle=True)
            self.samples = list(blob["samples"])
            logger.info(f"{self.name}: {len(self.samples)} samples (cached)")
            return
        seq_frames, subfolder = self._seq_frames()
        base = os.path.join(self.root, subfolder)
        contact_filter = self.filter_no_contact and self.filter_thresh > 0
        if contact_filter and not self.obj_meshes:
            logger.warning(f"{self.name}: FILTER_NO_CONTACT requested but no "
                           "YCB meshes found — filter disabled")
            contact_filter = False
        n_filtered = 0
        for seq, frame in seq_frames:
            meta_path = os.path.join(base, seq, "meta", frame + ".pkl")
            if not os.path.isfile(meta_path):
                continue
            with open(meta_path, "rb") as f:
                meta = pickle.load(f)
            if meta.get("handJoints3D") is None:
                continue
            # evaluation split ships only the wrist (reference :170-175)
            if np.asarray(meta["handJoints3D"]).size == 3:
                root = np.asarray(meta["handJoints3D"], np.float32).reshape(3)
                meta["handTrans"] = root
                meta["handJoints3D"] = np.tile(root[None],
                                               (CONST.NUM_JOINTS, 1))
                meta["handPose"] = np.zeros(48, np.float32)
                meta["handBeta"] = np.zeros(10, np.float32)
            if contact_filter and "handPose" in meta \
                    and meta["objName"] in self.obj_meshes \
                    and ho3dutils.min_contact_dis(
                        meta, self.obj_meshes, self.mano) > self.filter_thresh:
                n_filtered += 1
                continue
            self.samples.append({
                "img": os.path.join(base, seq, "rgb", frame + self.rgb_ext),
                "meta": meta,
                "seq": seq,
            })
        if n_filtered:
            logger.info(f"{self.name}: contact filter dropped {n_filtered} "
                        f"frames (> {self.filter_thresh} mm)")
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
        if j.ndim == 1:  # uncached raw eval meta
            j = np.tile(j[None], (CONST.NUM_JOINTS, 1))
        else:
            j = j[_REORDER]
        return j @ _CAM_EXTR.T

    def get_corners_3d(self, idx):
        c = np.asarray(self.samples[idx]["meta"]["objCorners3D"], np.float32)
        return c @ _CAM_EXTR.T

    def _can_offset(self, idx) -> np.ndarray:
        """Bbox center of the object model in its RAW (unflipped) frame —
        the origin of this repo's canonical object frame. From the mesh
        verts when YCB models are on disk (reference center_vert_bbox over
        the ds mesh), else from the rest corners (= model bbox)."""
        meta = self.samples[idx]["meta"]
        mesh = self.obj_meshes.get(meta["objName"])
        if mesh is not None:
            v = mesh["verts"]
        else:
            v = np.asarray(meta["objCorners3DRest"], np.float32)
        return (v.min(0) + v.max(0)) / 2.0

    def get_corners_can(self, idx):
        meta = self.samples[idx]["meta"]
        corners = np.asarray(meta["objCorners3DRest"], np.float32)
        return corners - self._can_offset(idx)

    def get_obj_transf(self, idx):
        """Maps this repo's canonical frame (raw model, bbox-centered) to
        camera space: the bbox-center offset folds into the translation
        (reference get_obj_transf_wrt_cam "HACK" block, ho3d.py:440-463 —
        same algebra, unflipped-can convention)."""
        meta = self.samples[idx]["meta"]
        rot = cv2.Rodrigues(np.asarray(meta["objRot"], np.float64).reshape(3))[0]
        rot = rot.astype(np.float32)
        tsl = np.asarray(meta["objTrans"], np.float32)
        offset = self._can_offset(idx).astype(np.float32)
        transf = np.eye(4, dtype=np.float32)
        transf[:3, :3] = _CAM_EXTR @ rot
        transf[:3, 3] = _CAM_EXTR @ (rot @ offset + tsl)
        return transf

    def get_obj_idx(self, idx):
        name = self.samples[idx]["meta"]["objName"]
        return CONST.YCB_CLASSES2IDX.get(name, 0)

    def get_obj_verts_can(self, idx):
        """Bbox-centered object vertices in the raw model frame (this
        repo's can convention — the cam-extr flip lives in OBJ_TRANSF /
        the use_ho3d_ycb paths, matching get_corners_can); None when YCB
        meshes are absent."""
        name = self.samples[idx]["meta"]["objName"]
        if name not in self._verts_can_cache:
            mesh = self.obj_meshes.get(name)
            if mesh is None:
                return None
            verts = mesh["verts"]
            center = (verts.min(0) + verts.max(0)) / 2.0
            self._verts_can_cache[name] = (verts - center).astype(np.float32)
        return self._verts_can_cache[name]

    # ---- MANO annotations (reference :253-262, 523-569) ----
    def _hand_info(self, idx):
        meta = self.samples[idx]["meta"]
        return (np.asarray(meta["handPose"], np.float32).reshape(-1),
                np.asarray(meta["handTrans"], np.float32).reshape(3),
                np.asarray(meta["handBeta"], np.float32).reshape(-1))

    def _has_mano(self, idx) -> bool:
        meta = self.samples[idx]["meta"]
        return "handPose" in meta and "handBeta" in meta \
            and "handTrans" in meta

    def get_hand_pose(self, idx):
        """(48,) axis-angle wrt camera: cam-extr folds into the global
        segment (reference get_hand_pose_wrt_cam :523-531)."""
        if not self._has_mano(idx):
            return None
        pose, _, _ = self._hand_info(idx)
        root = rotmat_to_aa_np(_CAM_EXTR @ aa_to_rotmat_np(pose[:3]))
        return np.concatenate([root, pose[3:]]).astype(np.float32)

    def get_hand_shape(self, idx):
        if not self._has_mano(idx):
            return None
        return self._hand_info(idx)[2]

    def get_hand_verts_3d(self, idx):
        """FK verts + handTrans, cam-extr-flipped (reference :253-262)."""
        if not self._has_mano(idx):
            return None
        pose, tsl, shape = self._hand_info(idx)
        verts, _ = self.mano(pose, shape)
        return ((verts + tsl) @ _CAM_EXTR.T).astype(np.float32)

    def get_sides(self, idx):
        return "right"


@DATASET.register_module
class HO3DV3(HO3D):
    version = "v3"
