"""Generated poses -> fully-formed training sample batches, in one jit.

Parity: ``anakin/artiboost/rendered_dataset.py`` __getitem__ (:155-274)
— crop around hand/object, affine + intrinsics update, visibility >=40%
rules, blur/color jitter, normalization, and the Queries/SynthQueries
sample schema. TPU redesign: the crop is computed *before* rendering and
folded into the camera (render-at-crop), and the whole batch is one
fused device computation feeding the train step directly.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from artiboost_tpu.artiboost.object_library import ObjectLibrary
from artiboost_tpu.artiboost.pose_generator import (
    GeneratedPoses,
    decode_final_hand,
    rotate_hand_global,
)
from artiboost_tpu.artiboost.renderer import (
    RenderAssets,
    _color_jitter,
    _gaussian_blur,
    build_scene_incidence,
    build_scene_lod,
    compose_scene,
    compose_scene_arrays,
    render_scene,
)
from artiboost_tpu.datasets.hoquery import Queries, SynthQueries
from artiboost_tpu.mano.model import ManoModel
from artiboost_tpu.utils.misc import CONST
from artiboost_tpu.utils.transform import batch_persp_proj2d, get_affine_trans_no_rot


class SynthConfig(NamedTuple):
    image_size: int = 224
    raw_size: int = 512
    fx: float = 435.0
    fy: float = 435.0
    cx: float = 256.0
    cy: float = 256.0
    bbox_expand_ratio: float = 1.2
    crop_model: str = "root_obj"
    center_idx: int = 0
    aug: bool = True
    center_jit: float = 0.1
    scale_jit: float = 0.1
    max_rot: float = 0.2
    blur_max_sigma: float = 1.0
    # reference capability renderer.py:113-116 (its training path leaves
    # it off: render_infra.py:57 never passes motion_blur) — kernel width
    # of the horizontal box blur, applied per-sample with probability
    motion_blur: int = 0
    motion_blur_prob: float = 1.0
    # pyrender (the reference renderer) culls backfaces by default, so
    # culling is the parity behavior; all meshes here (real MANO/YCB AND
    # the synthetic stand-ins) are consistently outward-wound. Measured
    # +7.7% synth throughput (script/probe_cull.py) — the raster is
    # per-tile-overhead-bound, so halving faces buys less than 2x
    cull_backfaces: bool = True
    # render LOD: per-component face budget for the decimated RENDER
    # geometry (supervision tensors stay full-res). -1 = auto (128 faces
    # per component at <=256px render-at-crop since round 4: synth 57.6
    # vs 72.5 ms at budget 256, mean abs image delta between the two
    # 0.0113 — off above 256px; mesh detail is sub-pixel at a 224x224
    # crop, ops/decimate.py), 0 = off, >0 explicit budget (LOD_FACES:
    # 256 is the conservative round-3 point).
    lod_faces: int = -1
    # per-pixel UV texture sampling (parity: the reference samples
    # textures per fragment in GL; Gouraud vertex colors are the
    # fallback when texture assets are absent)
    textured: bool = True
    bilinear: bool = False
    # albedo fetched once per s x s pixel quad (shade/edges per-pixel);
    # the texel row gather dominates texture cost. Default 2 measured
    # -12.5 ms/batch at B=128 @224^2 with mean abs image delta 0.005
    # (probe_texsub.py; fused train +10%) — set 1 for exact per-pixel
    # fetch. See renderer.sample_textures + docs/PERF.md round 4.
    tex_subsample: int = 2
    # post-render image passes (blur/jitter/normalize) in bf16. Measured
    # NEUTRAL on-chip (66.6 vs 66.5 ms, probe_rest round 4 — the image
    # tail is op-bound, not bandwidth-bound), so the default stays f32;
    # the knob remains for memory-constrained configs. When on, IMAGE is
    # emitted bf16 (training casts to bf16 at the backbone anyway).
    image_bf16: bool = False
    # rasterizer tile-shape overrides (None = per-resolution auto; the
    # LOD default below is from the on-chip sweep in script/probe_lod.py)
    tile_px: int = None
    sub_k: int = None
    # quad-rate rasterization (VERDICT r4 item 4): rasterize coverage /
    # depth / interpolants at (H/s, W/s) and upsample to the crop — the
    # kernel's pass-1 floor is "every pixel tests >= 1 chunk of 128
    # lanes", so halving resolution attacks the floor itself, not the
    # tuning. None = auto: 2 when the crop divides evenly, else 1.
    # Measured (round 5, B=128 @224²): mixed train 62.2 -> 42.0 ms/step
    # (+48%), mean abs image delta 0.0090 vs exact — below the accepted
    # LOD/TEX_SUBSAMPLE deltas. RENDER_SCALE: 1 restores the exact
    # per-pixel raster. Upsample is nearest (the interpolants are
    # smooth; silhouettes quantize to the quad grid, like TEX_SUBSAMPLE).
    render_scale: Optional[int] = None


def _annot_center_scale(pts2d: jnp.ndarray):
    """(B, N, 2) -> center (B, 2), scale (B,) (parity HOdata helpers)."""
    lo = jnp.min(pts2d, axis=1)
    hi = jnp.max(pts2d, axis=1)
    center = (lo + hi) / 2.0
    scale = jnp.max(hi - lo, axis=1)
    return center, scale


def make_synth_batch_fn(
    mano_model: ManoModel,
    obj_lib: ObjectLibrary,
    assets: RenderAssets,
    cfg: SynthConfig,
):
    """-> fn(key, gen: GeneratedPoses, idx (B,)) -> sample dict batch."""

    H = W = cfg.image_size
    raw_intr = jnp.asarray([
        [cfg.fx, 0.0, cfg.cx],
        [0.0, cfg.fy, cfg.cy],
        [0.0, 0.0, 1.0],
    ])
    # per-pixel texturing (VERDICT r2 item 2): on when every texture
    # asset exists (synthetic stand-ins always do; real HTML/YCB when
    # present on disk)
    textured = (cfg.textured and assets.hand_textures is not None
                and assets.hand_uvs is not None
                and obj_lib.textures is not None and obj_lib.uvs is not None)
    atlas, n_hand_tex = None, 0
    if textured:
        from artiboost_tpu.artiboost.object_library import _resize_tex

        hand_texs = np.asarray(assets.hand_textures)
        obj_texs = np.asarray(obj_lib.textures)
        T = max(hand_texs.shape[1], obj_texs.shape[1])
        pages = ([_resize_tex(t, T) for t in hand_texs]
                 + [_resize_tex(t, T) for t in obj_texs])
        atlas = jnp.asarray(np.stack(pages))
        n_hand_tex = hand_texs.shape[0]

    # render LOD (VERDICT r2 item 1): decimate render-only geometry once
    # at build time; -1 = auto by crop resolution. Budget 256/component
    # measured fastest (script/probe_lod.py: 142 -> 73 ms @B=128 224^2,
    # 1.94x) with golden-bounded image deltas (tests/test_decimate.py)
    lod_faces = cfg.lod_faces
    if lod_faces < 0:
        lod_faces = 128 if cfg.image_size <= 256 else 0
    lod = None
    if lod_faces > 0:
        lod = build_scene_lod(
            np.asarray(mano_model.v_template), np.asarray(assets.hand_faces),
            assets.hand_color_bank, obj_lib, lod_faces,
            hand_uv_bank=assets.hand_uvs if textured else None)
        from artiboost_tpu.utils.logger import logger

        logger.info(
            f"render LOD: hand {assets.hand_faces.shape[0]} -> "
            f"{lod.hand_faces.shape[0]} faces, objects "
            f"{obj_lib.f_max} -> {lod.obj_faces.shape[1]} (budget {lod_faces})")

    # per-object incidence tables (host precompute): gather-only vertex
    # normals inside the render. A pathological mesh (high-valence hub
    # vertex) would blow the fixed degree up and make the gather slower
    # than the scatter it replaces — fall back in that case.
    scene_inc = None
    if lod is None:
        scene_inc = build_scene_incidence(assets.hand_faces, obj_lib,
                                          n_hand=778)
        if scene_inc.shape[2] > 64:
            from artiboost_tpu.utils.logger import logger

            logger.warning(
                f"scene max vertex degree {scene_inc.shape[2]} > 64: using "
                "scatter-add vertex normals (gather table would be oversized)")
            scene_inc = None

    def synth_batch(key: jax.Array, gen: GeneratedPoses, idx: jnp.ndarray) -> Dict:
        B = idx.shape[0]
        keys = jax.random.split(key, 8)

        # ---- decode final hand + object geometry ----
        hand = decode_final_hand(mano_model, gen, idx)
        joints_3d = hand["joints"]                 # (B, 21, 3)
        hand_verts = hand["hand_verts"]
        oid = gen.obj_id[idx]
        vid = gen.persp_id[idx]
        gid = gen.grasp_id[idx]
        obj_pose = gen.obj_pose[idx]               # (B, 4, 4)
        corners_can = obj_lib.corners_can[oid]
        corners_3d = (
            jnp.einsum("bij,bnj->bni", obj_pose[:, :3, :3], corners_can)
            + obj_pose[:, None, :3, 3]
        )

        intr_b = jnp.broadcast_to(raw_intr[None], (B, 3, 3))
        joints_2d_raw = batch_persp_proj2d(joints_3d, intr_b)
        corners_2d_raw = batch_persp_proj2d(corners_3d, intr_b)

        # ---- crop (rendered_dataset :276-304) ----
        if cfg.crop_model == "hand":
            crop_pts = joints_2d_raw
        elif cfg.crop_model == "root_obj":
            crop_pts = jnp.concatenate([joints_2d_raw[:, :1], corners_2d_raw], axis=1)
        else:  # hand_obj
            crop_pts = jnp.concatenate([joints_2d_raw, corners_2d_raw], axis=1)
        bbox_center, bbox_scale = _annot_center_scale(crop_pts)
        bbox_scale = bbox_scale * cfg.bbox_expand_ratio

        rot_rad = jnp.zeros((B,))
        if cfg.aug:
            cjit = (jax.random.uniform(keys[0], (B, 2)) * 2.0 - 1.0)
            bbox_center = bbox_center + cfg.center_jit * bbox_scale[:, None] * cjit
            sjit = jnp.clip(
                jax.random.normal(keys[1], (B,)) * (cfg.scale_jit / 3.0) + 1.0,
                1.0 - cfg.scale_jit, 1.0 + cfg.scale_jit)
            bbox_scale = bbox_scale * sjit
            rot_rad = jax.random.uniform(keys[2], (B,), minval=-cfg.max_rot,
                                         maxval=cfg.max_rot)

        # in-plane rotation about the optical axis = rotate the scene
        c, s = jnp.cos(rot_rad), jnp.sin(rot_rad)
        zero, one = jnp.zeros_like(c), jnp.ones_like(c)
        rot_mat = jnp.stack([
            jnp.stack([c, -s, zero], -1),
            jnp.stack([s, c, zero], -1),
            jnp.stack([zero, zero, one], -1),
        ], -2)  # (B, 3, 3)

        # rotated crop center (reference get_affine_transform semantics):
        # center moves with the scene rotation about the optical center
        oc = jnp.asarray([cfg.cx, cfg.cy])
        cen = bbox_center - oc
        cen_rot = jnp.stack([
            c * cen[:, 0] - s * cen[:, 1],
            s * cen[:, 0] + c * cen[:, 1],
        ], -1) + oc
        post_rot = get_affine_trans_no_rot(cen_rot, bbox_scale, (W, H))  # (B, 3, 3)
        new_intr = post_rot @ intr_b  # (B, 3, 3)

        # ---- rotate geometry, render directly at the crop ----
        joints_3d_r = jnp.einsum("bij,bnj->bni", rot_mat, joints_3d)
        corners_3d_r = jnp.einsum("bij,bnj->bni", rot_mat, corners_3d)
        hand_verts_r = jnp.einsum("bij,bnj->bni", rot_mat, hand_verts)
        obj_pose_r = obj_pose.at[:, :3].set(rot_mat @ obj_pose[:, :3])

        tex_id = jax.random.randint(keys[3], (B,), 0, assets.hand_color_bank.shape[0])
        texturing = None
        if lod is not None:
            # render-only decimated geometry; supervision stays full-res
            verts, colors, faces, fvalid = compose_scene_arrays(
                hand_verts_r[:, lod.hand_rep], lod.hand_bank[tex_id],
                lod.hand_faces, lod.obj_verts[oid], lod.obj_colors[oid],
                lod.obj_faces[oid], lod.obj_face_valid[oid], obj_pose_r)
            inc = None if lod.incidence is None else lod.incidence[oid]
            if textured:
                from artiboost_tpu.artiboost.renderer import SceneTextures

                uv = jnp.concatenate(
                    [lod.hand_uv_bank[tex_id], lod.obj_uvs[oid]], axis=1)
                texturing = SceneTextures(
                    atlas=atlas, hand_page=tex_id,
                    obj_page=n_hand_tex + oid, uv=uv,
                    n_hand_faces=int(lod.hand_faces.shape[0]),
                    n_hand_verts=int(lod.hand_uv_bank.shape[1]))
        else:
            hand_colors = assets.hand_color_bank[tex_id]
            verts, colors, faces, fvalid = compose_scene(
                hand_verts_r, hand_colors, assets.hand_faces, obj_lib, oid,
                obj_pose_r)
            inc = None if scene_inc is None else scene_inc[oid]
            if textured:
                from artiboost_tpu.artiboost.renderer import SceneTextures

                uv = jnp.concatenate(
                    [assets.hand_uvs[tex_id], obj_lib.uvs[oid]], axis=1)
                texturing = SceneTextures(
                    atlas=atlas, hand_page=tex_id,
                    obj_page=n_hand_tex + oid, uv=uv,
                    n_hand_faces=int(assets.hand_faces.shape[0]),
                    n_hand_verts=int(assets.hand_uvs.shape[1]))
        # LOD scenes have so few live chunks that the per-grid-step fixed
        # cost dominates: sub_k=8 @ tile 512 with the channel-transposed
        # output block measured best on-chip (script/probe_outct.py,
        # 79.9 ms vs 92.8 @ the old sub_k 4 / (TP, 4) layout — the dense
        # lane-aligned output DMA also un-blocks larger sub_k)
        tile_px, sub_k = cfg.tile_px, cfg.sub_k
        if cfg.render_scale in (None, 0):  # auto (round-5 default)
            rs = 2 if (H % 2 == 0 and W % 2 == 0) else 1
        else:
            rs = max(int(cfg.render_scale), 1)
        if lod is not None and tile_px is None and sub_k is None:
            # resolution-aware retune (round 5, script/probe_rs2_tiles.py):
            # at the quad-rate render (<=128² foreground) tile 256 /
            # sub_k 16 measured +7.3% end-to-end over the 224²-tuned
            # 512/8 (21.3 vs 22.9 ms/batch); full-res keeps 512/8
            tile_px, sub_k = ((256, 16) if (H // rs) * (W // rs) <= 128 * 128
                              else (512, 8))
        if rs > 1:
            # quad-rate raster: fold the downscale into the camera, render
            # the FOREGROUND at (H/rs, W/rs); render_scene nearest-
            # upsamples it before compositing the full-res background, so
            # only foreground interpolants + silhouettes quantize to the
            # rs-grid (measured delta: docs/PERF.md round 5).
            assert H % rs == 0 and W % rs == 0, (H, W, rs)
            scale_mat = jnp.asarray([[1.0 / rs, 0.0, 0.0],
                                     [0.0, 1.0 / rs, 0.0],
                                     [0.0, 0.0, 1.0]])
            render_intr = scale_mat @ new_intr
            rH, rW = H // rs, W // rs
        else:
            render_intr, rH, rW = new_intr, H, W
        img, depth = render_scene(
            verts, colors, faces, fvalid, render_intr, assets.backgrounds,
            keys[4], rH, rW,
            cull_backfaces=cfg.cull_backfaces,
            incidence=inc,
            motion_blur=cfg.motion_blur,
            motion_blur_prob=cfg.motion_blur_prob,
            tile_px=tile_px, sub_k=sub_k,
            texturing=texturing, bilinear=cfg.bilinear,
            tex_subsample=cfg.tex_subsample,
            out_size=(H, W) if rs > 1 else None)

        if cfg.image_bf16:
            img = img.astype(jnp.bfloat16)
        if cfg.aug:
            sigma = jax.random.uniform(keys[5], (B,)) * cfg.blur_max_sigma
            img = _gaussian_blur(img, sigma)
            img = _color_jitter(img, keys[6])

        # ---- 2d keypoints in crop coords ----
        # with render-at-crop, crop-space 2d == projection with new_intr
        joints_2d = batch_persp_proj2d(joints_3d_r, new_intr)
        corners_2d = batch_persp_proj2d(corners_3d_r, new_intr)

        # ---- visibility (>= 40% rules, rendered_dataset :215-245) ----
        def vis_rule(pts_raw, pts_crop, n, thresh):
            in_raw = (
                (pts_raw[..., 0] >= 0) & (pts_raw[..., 0] < cfg.raw_size)
                & (pts_raw[..., 1] >= 0) & (pts_raw[..., 1] < cfg.raw_size)
            ).astype(jnp.float32)
            in_crop = (
                (pts_crop[..., 0] >= 0) & (pts_crop[..., 0] < W)
                & (pts_crop[..., 1] >= 0) & (pts_crop[..., 1] < H)
            ).astype(jnp.float32)
            raw_ok = jnp.sum(in_raw, axis=1, keepdims=True) >= n * thresh
            crop_ok = jnp.sum(in_crop, axis=1, keepdims=True) >= n * thresh
            return jnp.where(raw_ok & crop_ok, in_crop, 0.0)

        joints_vis = vis_rule(joints_2d_raw, joints_2d, CONST.NUM_JOINTS, 0.4)
        corners_vis = vis_rule(corners_2d_raw, corners_2d, CONST.NUM_CORNERS, 0.4)

        root_joint = joints_3d_r[:, cfg.center_idx]

        # ---- MANO annotation parity with real batches (hodata.py:304-327)
        # the synth sample carries the refined MANO pose re-expressed in
        # the FINAL camera frame (cam_free roll + in-plane aug rotation
        # folded into the global segment, exactly like real data folds its
        # aug rotation) so mixed-batch key intersection keeps
        # HAND_POSE/HAND_SHAPE instead of silently dropping real-data
        # supervision (VERDICT r2 item 6)
        rot_total = rot_mat @ gen.cam_free[idx]
        hand_pose_final, _ = rotate_hand_global(
            mano_model, rot_total, gen.hand_pose[idx], gen.hand_shape[idx],
            gen.hand_tsl[idx] + gen.cam_offset[idx])

        # object verts in camera space, root-relative (hodata.py:295-302)
        overts_3d = (
            jnp.einsum("bij,bnj->bni", obj_pose_r[:, :3, :3], obj_lib.verts[oid])
            + obj_pose_r[:, None, :3, 3]
        )

        return {
            Queries.IMAGE: img - jnp.asarray(0.5, img.dtype),  # mean .5, std 1
            Queries.CAM_INTR: new_intr,
            Queries.JOINTS_3D: joints_3d_r - root_joint[:, None],
            Queries.JOINTS_2D: joints_2d,
            Queries.ROOT_JOINT: root_joint,
            Queries.JOINTS_VIS: joints_vis,
            Queries.CORNERS_3D: corners_3d_r - root_joint[:, None],
            Queries.CORNERS_2D: corners_2d,
            Queries.CORNERS_CAN: corners_can,
            Queries.CORNERS_VIS: corners_vis,
            Queries.OBJ_TRANSF: obj_pose_r,
            Queries.OBJ_IDX: oid + 1,  # YCB-style 1-based object index
            Queries.OBJ_VERTS_CAN: obj_lib.verts[oid],
            Queries.OBJ_VERTS_3D: overts_3d - root_joint[:, None],
            Queries.PADDING_MASK: obj_lib.vert_valid[oid],
            Queries.SAMPLE_IDX: idx,
            Queries.HAND_VERTS_3D: hand_verts_r - root_joint[:, None],
            Queries.HAND_POSE: hand_pose_final,
            Queries.HAND_SHAPE: gen.hand_shape[idx],
            SynthQueries.IS_SYNTH: jnp.ones((B,), jnp.int32),
            SynthQueries.OBJ_ID: oid,
            SynthQueries.PERSP_ID: vid,
            SynthQueries.GRASP_ID: gid,
        }

    return synth_batch
