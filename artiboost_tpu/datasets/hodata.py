"""Host-side real-data pipeline: HOdata base class.

Parity: ``anakin/datasets/hodata.py`` — the accessor contract
(get_image/get_joints_3d/...), the full __getitem__ pipeline (side flip,
bbox crop + jitter aug, affine + intrinsics update, root-relative
joints/corners, OBJ_TRANSF rotation composition, 40% visibility rules,
blur/color jitter, mean-0.5 normalization), and batch assembly with
variable-size object vertex padding.

Host-side by design: raw image IO and JPEG decode belong on CPU; the
produced batches are dense numpy dicts that feed straight into jit.
Layout difference vs the torch reference: images are NHWC float32.
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Dict, List, Optional, Sequence

import numpy as np

from artiboost_tpu.datasets.hoquery import Queries, SynthQueries
from artiboost_tpu.utils import img_augment
from artiboost_tpu.utils.logger import logger
from artiboost_tpu.utils.misc import CONST


def _np_affine(center, scale, optical_center, out_res, rot):
    """numpy twin of utils.transform.get_affine_transform."""
    cs, sn = np.cos(rot), np.sin(rot)
    rot_mat = np.array([[cs, -sn, 0], [sn, cs, 0], [0, 0, 1]], np.float32)
    hom = np.array([center[0], center[1], 1.0], np.float32)
    origin_rot_center = (rot_mat @ hom)[:2]
    t_mat = np.eye(3, dtype=np.float32)
    t_mat[0, 2], t_mat[1, 2] = -optical_center[0], -optical_center[1]
    t_inv = t_mat.copy()
    t_inv[:2, 2] *= -1
    transformed_center = (t_inv @ rot_mat @ t_mat @ hom)[:2]

    def no_rot(c):
        res0, res1 = float(out_res[0]), float(out_res[1])
        ratio = res0 / res1
        a = np.zeros((3, 3), np.float32)
        a[0, 0] = res0 / scale
        a[1, 1] = res1 / scale * ratio
        a[0, 2] = res0 * (-c[0] / scale + 0.5)
        a[1, 2] = res1 * (-c[1] / scale * ratio + 0.5)
        a[2, 2] = 1
        return a

    total = no_rot(origin_rot_center) @ rot_mat
    post_rot = no_rot(transformed_center)
    return total, post_rot


def _transform_coords(pts, A):
    hom = np.concatenate([pts, np.ones_like(pts[:, :1])], 1)
    return (A @ hom.T).T[:, :2]


class HODataset(ABC):
    """Abstract hand-object dataset with the reference accessor contract."""

    def __init__(self, **cfg):
        preset = cfg["DATA_PRESET"]
        self.data_root = cfg.get("DATA_ROOT", "./data")
        self.data_split = cfg.get("DATA_SPLIT", "train")
        self.use_cache = preset.get("USE_CACHE", True)
        self.filter_no_contact = preset.get("FILTER_NO_CONTACT", False)
        self.filter_thresh = float(preset.get("FILTER_THRESH", 0.0))
        self.bbox_expand_ratio = float(preset.get("BBOX_EXPAND_RATIO", 1.2))
        self.crop_model = preset.get("CROP_MODEL", "hand_obj")
        self.require_full_image = preset.get("FULL_IMAGE", False)
        if self.require_full_image:
            self.bbox_expand_ratio = 1.0
        self.aug = cfg.get("AUG", False)
        self.raw_size = (256, 256)  # overridden by subclasses
        self.image_size = tuple(preset.get("IMAGE_SIZE", (224, 224)))
        self.mini_factor = float(cfg.get("MINI_FACTOR", 1.0))
        self.center_idx = int(preset.get("CENTER_IDX", 9))
        self.sides = CONST.SIDE
        self.njoints = CONST.NUM_JOINTS
        self.ncorners = CONST.NUM_CORNERS
        self.rng = np.random.RandomState(cfg.get("SEED", 1))

        if self.aug:
            self.hue, self.saturation = 0.075, 0.1
            self.contrast, self.brightness = 0.1, 0.1
            self.blur_radius = 0.1
            aug_param = cfg.get("AUG_PARAM") or {}
            self.scale_jittering = aug_param.get("SCALE_JIT", 0.0)
            self.center_jittering = aug_param.get("CENTER_JIT", 0.0)
            self.max_rot = aug_param.get("MAX_ROT", 0.0) * np.pi
        else:
            self.hue = self.saturation = self.contrast = self.brightness = 0.0
            self.blur_radius = 0.0
            self.scale_jittering = self.center_jittering = self.max_rot = 0.0

    # ---- accessor contract (parity: hodata.py abstract getters) ----
    @abstractmethod
    def __len__(self) -> int: ...

    @abstractmethod
    def get_image(self, idx) -> np.ndarray: ...      # (H, W, 3) uint8 RGB

    @abstractmethod
    def get_cam_intr(self, idx) -> np.ndarray: ...   # (3, 3)

    @abstractmethod
    def get_joints_3d(self, idx) -> np.ndarray: ...  # (21, 3) camera space

    @abstractmethod
    def get_corners_3d(self, idx) -> np.ndarray: ...

    @abstractmethod
    def get_corners_can(self, idx) -> np.ndarray: ...

    @abstractmethod
    def get_obj_transf(self, idx) -> np.ndarray: ...  # (4, 4)

    @abstractmethod
    def get_obj_idx(self, idx) -> int: ...

    def get_obj_verts_can(self, idx) -> Optional[np.ndarray]:
        return None

    # MANO hand annotations (optional — real datasets with MANO fits
    # override these; reference accessors ho3d.py:253-262,559-569 and
    # dexycb.py:211-218). All in camera space.
    def get_hand_pose(self, idx) -> Optional[np.ndarray]:
        """(48,) axis-angle MANO pose wrt camera, or None."""
        return None

    def get_hand_shape(self, idx) -> Optional[np.ndarray]:
        """(10,) MANO betas, or None."""
        return None

    def get_hand_verts_3d(self, idx) -> Optional[np.ndarray]:
        """(778, 3) MANO vertices in camera space, or None."""
        return None

    def get_sides(self, idx) -> str:
        return self.sides

    def get_sample_idxs(self) -> np.ndarray:
        n = len(self)
        return np.arange(n)

    def get_joints_2d(self, idx) -> np.ndarray:
        K = self.get_cam_intr(idx)
        j = self.get_joints_3d(idx)
        hom = (K @ j.T).T
        return hom[:, :2] / np.maximum(hom[:, 2:], 1e-8)

    def get_corners_2d(self, idx) -> np.ndarray:
        K = self.get_cam_intr(idx)
        c = self.get_corners_3d(idx)
        hom = (K @ c.T).T
        return hom[:, :2] / np.maximum(hom[:, 2:], 1e-8)

    # ---- helpers (parity: HOdata.get_annot_center/scale) ----
    @staticmethod
    def get_annot_center(pts2d: np.ndarray) -> np.ndarray:
        lo, hi = pts2d.min(0), pts2d.max(0)
        return (lo + hi) / 2.0

    @staticmethod
    def get_annot_scale(pts2d: np.ndarray, scale_factor: float = 1.0) -> float:
        lo, hi = pts2d.min(0), pts2d.max(0)
        return float(max(hi - lo) * scale_factor)

    def get_center_scale_wrt_bbox(self, idx):
        if self.require_full_image:
            return np.array([self.raw_size[0] / 2, self.raw_size[1] / 2], np.float32), \
                float(self.raw_size[0])
        if self.crop_model == "hand":
            pts = self.get_joints_2d(idx)
        elif self.crop_model == "root_obj":
            pts = np.concatenate([self.get_joints_2d(idx)[[0]], self.get_corners_2d(idx)], 0)
        else:  # hand_obj
            pts = np.concatenate([self.get_joints_2d(idx), self.get_corners_2d(idx)], 0)
        return self.get_annot_center(pts), self.get_annot_scale(pts)

    def _vis_rule(self, raw_2d, crop_2d, n):
        """40%-visibility rule (hodata.py:390-432); eval splits all-ones."""
        if self.data_split not in ("train", "trainval"):
            return np.ones(n, np.float32)
        in_raw = (
            (raw_2d[:, 0] >= 0) & (raw_2d[:, 0] < self.raw_size[0])
            & (raw_2d[:, 1] >= 0) & (raw_2d[:, 1] < self.raw_size[1])
        )
        if in_raw.sum() < n * 0.4:
            return np.zeros(n, np.float32)
        in_crop = (
            (crop_2d[:, 0] >= 0) & (crop_2d[:, 0] < self.image_size[0])
            & (crop_2d[:, 1] >= 0) & (crop_2d[:, 1] < self.image_size[1])
        ).astype(np.float32)
        if in_crop.sum() < n * 0.4:
            return np.zeros(n, np.float32)
        return in_crop

    def _flip_2d(self, raw_size, pts):
        out = pts.copy()
        out[:, 0] = raw_size[0] - out[:, 0]
        return out

    @staticmethod
    def _flip_3d(pts):
        out = pts.copy()
        out[:, 0] *= -1
        return out

    # ---- the pipeline ----
    def _make_geom(self, idx) -> Dict:
        """Everything except pixel work: annotations, crop affine, aug
        parameter draws. Shared by the python and native image paths."""
        idx = int(self.get_sample_idxs()[idx])
        sample: Dict = {
            SynthQueries.IS_SYNTH: 0,
            SynthQueries.OBJ_ID: -1,
            SynthQueries.PERSP_ID: -1,
            SynthQueries.GRASP_ID: -1,
        }
        flip = self.get_sides(idx) != self.sides

        bbox_center, bbox_scale = self.get_center_scale_wrt_bbox(idx)
        bbox_scale *= self.bbox_expand_ratio

        cam_intr = self.get_cam_intr(idx).astype(np.float32).copy()
        joints_3d = self.get_joints_3d(idx).astype(np.float32)
        joints_2d = self.get_joints_2d(idx).astype(np.float32)
        corners_3d = self.get_corners_3d(idx).astype(np.float32)
        corners_2d = self.get_corners_2d(idx).astype(np.float32)
        corners_can = self.get_corners_can(idx).astype(np.float32)

        if flip:
            bbox_center = bbox_center.copy()
            bbox_center[0] = self.raw_size[0] - bbox_center[0]
            joints_3d = self._flip_3d(joints_3d)
            corners_3d = self._flip_3d(corners_3d)
            joints_2d = self._flip_2d(self.raw_size, joints_2d)
            corners_2d = self._flip_2d(self.raw_size, corners_2d)

        if self.aug:
            center_jit = self.rng.uniform(-1, 1, 2)
            bbox_center = bbox_center + (self.center_jittering * bbox_scale * center_jit).astype(int)
            jit = np.clip(self.rng.normal(0, self.scale_jittering / 3.0) + 1.0,
                          1 - self.scale_jittering, 1 + self.scale_jittering)
            bbox_scale = bbox_scale * jit
            rot_rad = self.rng.uniform(-self.max_rot, self.max_rot)
            jitter = np.array([
                self.rng.uniform(1 - self.brightness, 1 + self.brightness),
                self.rng.uniform(1 - self.contrast, 1 + self.contrast),
                self.rng.uniform(1 - self.saturation, 1 + self.saturation),
                self.rng.uniform(0, 1) * self.blur_radius * 3,
            ], np.float32)
        else:
            rot_rad = 0.0
            jitter = np.array([1.0, 1.0, 1.0, 0.0], np.float32)

        rot_mat = np.array([
            [np.cos(rot_rad), -np.sin(rot_rad), 0],
            [np.sin(rot_rad), np.cos(rot_rad), 0],
            [0, 0, 1],
        ], np.float32)

        affine_transf, post_rot_transf = _np_affine(
            bbox_center, bbox_scale, (cam_intr[0, 2], cam_intr[1, 2]),
            self.image_size, rot_rad)

        cam_intr = (post_rot_transf @ cam_intr).astype(np.float32)
        sample[Queries.CAM_INTR] = cam_intr

        joints_3d = (rot_mat @ joints_3d.T).T
        root_joint = joints_3d[self.center_idx]
        sample[Queries.ROOT_JOINT] = root_joint
        sample[Queries.JOINTS_3D] = joints_3d - root_joint
        joints_2d_crop = _transform_coords(joints_2d, affine_transf).astype(np.float32)
        sample[Queries.JOINTS_2D] = joints_2d_crop
        sample[Queries.JOINTS_VIS] = self._vis_rule(joints_2d, joints_2d_crop, self.njoints)

        corners_3d = (rot_mat @ corners_3d.T).T
        sample[Queries.CORNERS_3D] = corners_3d - root_joint
        corners_2d_crop = _transform_coords(corners_2d, affine_transf).astype(np.float32)
        sample[Queries.CORNERS_2D] = corners_2d_crop
        sample[Queries.CORNERS_CAN] = corners_can
        sample[Queries.OBJ_IDX] = self.get_obj_idx(idx)
        sample[Queries.CORNERS_VIS] = self._vis_rule(corners_2d, corners_2d_crop, self.ncorners)

        base = self.get_obj_transf(idx).astype(np.float32)
        transf = np.eye(4, dtype=np.float32)
        transf[:3, :3] = rot_mat[:3, :3] @ base[:3, :3]
        transf[:3, 3] = rot_mat[:3, :3] @ base[:3, 3]
        sample[Queries.OBJ_TRANSF] = transf

        verts_can = self.get_obj_verts_can(idx)
        if verts_can is not None:
            sample[Queries.OBJ_VERTS_CAN] = verts_can.astype(np.float32)
            # cam-space verts through the (aug-rotated) obj transform,
            # root-relative like corners (reference hodata collates
            # OBJ_VERTS_3D for honetloss/chamfer, hodata.py:21-62)
            v3d = verts_can @ transf[:3, :3].T + transf[:3, 3]
            sample[Queries.OBJ_VERTS_3D] = (v3d - root_joint).astype(np.float32)

        # MANO annotations (when the dataset provides them): hand verts
        # follow the same flip/in-plane-rot/root-relative pipeline as
        # joints so ManoLoss / ChamferLoss / verts-MSSD run on real
        # batches; the aug rotation folds into the pose's global segment
        hand_verts = self.get_hand_verts_3d(idx)
        if hand_verts is not None:
            hv = hand_verts.astype(np.float32)
            if flip:
                hv = self._flip_3d(hv)
            hv = (rot_mat @ hv.T).T
            sample[Queries.HAND_VERTS_3D] = (hv - root_joint).astype(np.float32)
        hand_pose = self.get_hand_pose(idx)
        if hand_pose is not None:
            from artiboost_tpu.mano.numpy_fk import (aa_to_rotmat_np,
                                                     mirror_mano_pose,
                                                     rotmat_to_aa_np)
            hp = np.asarray(hand_pose, np.float32).copy()
            if flip:
                hp = mirror_mano_pose(hp)
            hp[:3] = rotmat_to_aa_np(rot_mat[:3, :3] @ aa_to_rotmat_np(hp[:3]))
            sample[Queries.HAND_POSE] = hp
        hand_shape = self.get_hand_shape(idx)
        if hand_shape is not None:
            sample[Queries.HAND_SHAPE] = np.asarray(hand_shape, np.float32)
        sample[Queries.SAMPLE_IDX] = idx
        sample["_affine"] = affine_transf
        sample["_jitter"] = jitter
        sample["_flip"] = flip
        return sample

    def __getitem__(self, idx) -> Dict:
        sample = self._make_geom(idx)
        affine_transf = sample.pop("_affine")
        jitter = sample.pop("_jitter")
        flip = sample.pop("_flip")
        img = self.get_image(int(sample[Queries.SAMPLE_IDX]))
        if flip:
            img = img[:, ::-1].copy()
        sample[Queries.IMAGE] = img_augment.augment_sample(
            img, affine_transf, jitter,
            (self.image_size[0], self.image_size[1]), aug=self.aug)
        return sample

    # ---- batch assembly (parity: ho_collate, hodata.py:17-62) ----
    def sample_batch(self, idx_list: Sequence[int],
                     use_native: Optional[bool] = None) -> Dict[str, np.ndarray]:
        """Batched sample assembly. When the native hostops library is
        available, the per-pixel image work (warp/blur/jitter/normalize)
        runs as one multithreaded C++ call over the whole batch."""
        from artiboost_tpu import native

        if use_native is None:
            use_native = native.available()
        if not use_native:
            return ho_collate([self[i] for i in idx_list])

        geoms = [self._make_geom(i) for i in idx_list]
        images = []
        inv_affines = []
        jitters = []
        for g in geoms:
            img = self.get_image(int(g[Queries.SAMPLE_IDX]))
            if g.pop("_flip"):
                img = img[:, ::-1].copy()
            images.append(img)
            inv_affines.append(np.linalg.inv(g.pop("_affine"))[:2])
            jitters.append(g.pop("_jitter"))
        out_imgs = native.warp_affine_batch(
            np.stack(images), np.stack(inv_affines), np.stack(jitters),
            self.image_size[1], self.image_size[0])
        for g, im in zip(geoms, out_imgs):
            g[Queries.IMAGE] = im
        return ho_collate(geoms)


def padded_host_loader(dataset, batch_size: int, shuffle: bool = False,
                       seed: int = 0):
    """Batched host iteration over the FULL dataset for eval passes.

    jit needs static shapes, so the final partial batch is repeat-padded
    to ``batch_size``; padded batches carry ``Queries.SAMPLE_VALID``
    (1 real / 0 pad) which the metrics and the Codalab dump honor. Full
    batches omit the key so the hot path stays maskless (no per-step
    device upload). Covers every sample, like the reference's torch
    DataLoader with ``drop_last=False`` (train/submit_reload.py:38-44).
    """
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
    for s in range(0, n, batch_size):
        idx = order[s:s + batch_size].tolist()
        n_valid = len(idx)
        while len(idx) < batch_size:
            idx.append(idx[-1])
        batch = dataset.sample_batch(idx)
        if n_valid < batch_size:
            valid = np.zeros((batch_size,), np.float32)
            valid[:n_valid] = 1.0
            batch[Queries.SAMPLE_VALID] = valid
        yield batch


def ho_collate(samples: List[Dict]) -> Dict[str, np.ndarray]:
    """Stack sample dicts; repeat-pad variable-size vertex fields and emit
    PADDING_MASK (parity: hodata_collate)."""
    extend_queries = [Queries.OBJ_VERTS_3D, Queries.OBJ_VERTS_CAN, Queries.OBJ_VERTS_2D]
    out: Dict[str, np.ndarray] = {}
    present = [q for q in extend_queries if q in samples[0]]
    if present:
        max_size = max(s[present[0]].shape[0] for s in samples)
        mask = np.zeros((len(samples), max_size), np.float32)
        for bi, s in enumerate(samples):
            orig = s[present[0]].shape[0]
            mask[bi, :orig] = 1.0
            for q in present:
                v = s[q]
                reps = int(max_size / v.shape[0] + 1)
                s[q] = np.concatenate([v] * reps)[:max_size]
        out[Queries.PADDING_MASK] = mask
    keys = samples[0].keys()
    for k in keys:
        out[k] = np.stack([np.asarray(s[k]) for s in samples])
    return out
