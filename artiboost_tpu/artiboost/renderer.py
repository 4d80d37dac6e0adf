"""On-device synthetic scene rendering: hand + object -> training image.

TPU-first replacement for the reference render farm
(``anakin/utils/renderer.py`` + ``anakin/artiboost/render_infra.py`` +
``rendered_dataset.py``). Key redesigns:

  * **render-at-crop**: the reference renders 512x512 then warps a
    224x224 crop; since the crop affine is scale+translate(+roll), we
    fold it into the camera (post-rot intrinsics + in-plane scene
    rotation) and rasterize directly at 224x224 — exact, and ~5x fewer
    pixels;
  * the hand texture bank and point-light randomization become
    per-vertex color banks + Gouraud shading before rasterization;
  * background compositing, gaussian blur, and color jitter are batched
    tensor ops fused into the same jit as the rasterizer;
  * no processes, no queues, no pickles: poses in, image batches out.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from artiboost_tpu.artiboost.object_library import ObjectLibrary
from artiboost_tpu.mano.model import ManoModel
from artiboost_tpu.ops.rasterizer import (
    build_face_incidence,
    project_verts,
    shade_vertices,
    vertex_normals,
    vertex_normals_indexed,
)
from artiboost_tpu.ops.rasterizer_pallas import rasterize_batch_pallas


class RenderAssets(NamedTuple):
    hand_faces: jnp.ndarray       # (Fh, 3) int32
    hand_color_bank: jnp.ndarray  # (n_tex, 778, 3) vertex-baked hand textures
    backgrounds: jnp.ndarray      # (n_bg, Hb, Wb, 3) float in [0, 1]
    # per-pixel texturing (None -> Gouraud vertex colors only)
    hand_uvs: Optional[jnp.ndarray] = None       # (n_tex, 778, 2)
    hand_textures: Optional[jnp.ndarray] = None  # (n_tex, T, T, 3)


def synthetic_backgrounds(n_bg: int = 8, size: int = 336, seed: int = 0) -> jnp.ndarray:
    """Procedural background bank (gradients + low-freq noise) standing in
    for ``assets/synth_bg`` when absent."""
    rng = np.random.RandomState(seed)
    bgs = []
    for _ in range(n_bg):
        lo = rng.rand(6, 6, 3).astype(np.float32)
        img = jax.image.resize(jnp.asarray(lo), (size, size, 3), "bilinear")
        bgs.append(np.asarray(img) * 0.8 + 0.1)
    return jnp.asarray(np.stack(bgs))


def synthetic_hand_color_bank(n_tex: int = 8, seed: int = 0) -> jnp.ndarray:
    """Skin-tone vertex-color bank standing in for the 51 HTML textured
    hands (``anakin/artiboost/hand_texture.py``)."""
    rng = np.random.RandomState(seed)
    base = np.array([0.80, 0.60, 0.50], np.float32)
    bank = []
    for _ in range(n_tex):
        tone = base * (0.7 + 0.5 * rng.rand(3).astype(np.float32))
        noise = rng.rand(778, 3).astype(np.float32) * 0.06
        bank.append(np.clip(tone + noise, 0.0, 1.0))
    return jnp.asarray(np.stack(bank))


def synthetic_hand_textures(template: np.ndarray, n_tex: int = 8,
                            T: int = 128, seed: int = 0
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Procedural skin textures + template-projected UVs standing in for
    the HTML hands' per-fragment texture maps -> (uvs (n_tex, 778, 2),
    textures (n_tex, T, T, 3)). UVs project the MANO template's (x, y)
    onto [0, 1]^2 (front/back share texels — fine for a skin stand-in)."""
    rng = np.random.RandomState(seed)
    t = np.asarray(template, np.float32)
    lo, hi = t.min(0), t.max(0)
    uv = (t[:, :2] - lo[:2]) / np.maximum(hi[:2] - lo[:2], 1e-6)
    base = np.array([0.80, 0.60, 0.50], np.float32)
    ty, tx = np.meshgrid(np.arange(T), np.arange(T), indexing="ij")
    texs = []
    for _ in range(n_tex):
        tone = base * (0.7 + 0.5 * rng.rand(3).astype(np.float32))
        # low-freq mottling + fine noise: visibly non-constant per pixel
        low = 0.85 + 0.15 * np.sin(2 * np.pi * tx / 48.0 + rng.rand() * 6) \
            * np.sin(2 * np.pi * ty / 64.0 + rng.rand() * 6)
        fine = 0.95 + 0.1 * rng.rand(T, T).astype(np.float32)
        texs.append(np.clip(tone[None, None] * (low * fine)[..., None], 0, 1))
    uvs = np.tile(uv[None], (n_tex, 1, 1)).astype(np.float32)
    return jnp.asarray(uvs), jnp.asarray(np.stack(texs).astype(np.float32))


def load_backgrounds(path: str, size: int = 336, max_n: int = 64) -> Optional[jnp.ndarray]:
    """Load a background-image pool from disk (reference composites random
    bg crops behind the render, ``anakin/utils/renderer.py:111-136``)."""
    import glob

    files = sorted(
        f for ext in ("*.jpg", "*.jpeg", "*.png")
        for f in glob.glob(os.path.join(path, "**", ext), recursive=True)
    )[:max_n]
    if not files:
        return None
    from PIL import Image

    bgs = []
    for f in files:
        im = Image.open(f).convert("RGB").resize((size, size), Image.BILINEAR)
        bgs.append(np.asarray(im, np.float32) / 255.0)
    return jnp.asarray(np.stack(bgs))


def load_html_hand_assets(html_root: str, n_verts: int = 778,
                          skip_ids: Tuple[int, ...] = (2,), tex_size: int = 256
                          ) -> Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Load the HTML textured hand meshes (``data/HTML_supp/html_{i:03d}/
    hand.obj``, 51 hands, reference ``anakin/artiboost/hand_texture.py``)
    -> (per-vertex-baked colors (n, 778, 3) for the Gouraud fallback,
    per-vertex UVs (n, 778, 2), textures (n, T, T, 3) for the per-pixel
    path — parity with the reference's per-fragment GL sampling)."""
    from PIL import Image

    banks, uv_banks, tex_banks = [], [], []
    for i in range(52):
        if i in skip_ids:
            continue
        d = os.path.join(html_root, f"html_{i:03d}")
        obj_path = os.path.join(d, "hand.obj")
        if not os.path.isfile(obj_path):
            continue
        uvs, v_uv, tex = [], {}, None
        with open(obj_path) as f:
            for line in f:
                t = line.split()
                if not t:
                    continue
                if t[0] == "vt":
                    uvs.append((float(t[1]), float(t[2])))
                elif t[0] == "f":
                    for corner in t[1:]:
                        parts = corner.split("/")
                        if len(parts) >= 2 and parts[1]:
                            v_uv.setdefault(int(parts[0]) - 1, int(parts[1]) - 1)
        for cand in ("texture.png", "texture.jpg", "hand.png", "hand.jpg"):
            p = os.path.join(d, cand)
            if os.path.isfile(p):
                tex = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
                break
        if tex is None or not uvs:
            continue
        H, W = tex.shape[:2]
        colors = np.full((n_verts, 3), 0.7, np.float32)
        uv_arr = np.zeros((n_verts, 2), np.float32)
        for v, vt in v_uv.items():
            if v < n_verts and vt < len(uvs):
                u, w = uvs[vt]
                uv_arr[v] = (u, w)
                px = min(int(u * (W - 1)), W - 1)
                py = min(int((1.0 - w) * (H - 1)), H - 1)
                colors[v] = tex[py, px]
        banks.append(colors)
        uv_banks.append(uv_arr)
        from artiboost_tpu.artiboost.object_library import _resize_tex

        tex_banks.append(_resize_tex(tex, tex_size))
    if not banks:
        return None
    return (jnp.asarray(np.stack(banks)), jnp.asarray(np.stack(uv_banks)),
            jnp.asarray(np.stack(tex_banks)))


def load_html_hand_colors(html_root: str, n_verts: int = 778,
                          skip_ids: Tuple[int, ...] = (2,)) -> Optional[jnp.ndarray]:
    """Gouraud-only view of ``load_html_hand_assets`` (kept for callers
    that only need the vertex-baked color bank)."""
    assets = load_html_hand_assets(html_root, n_verts, skip_ids)
    return None if assets is None else assets[0]


def default_render_assets(mano_model: ManoModel, n_bg: int = 8, n_tex: int = 8,
                          bg_size: int = 336, bgs_path: Optional[str] = None,
                          html_path: Optional[str] = None) -> RenderAssets:
    """Real asset banks when paths exist, synthetic stand-ins otherwise."""
    backgrounds = load_backgrounds(bgs_path, bg_size) if bgs_path else None
    html = load_html_hand_assets(html_path) if html_path else None
    if html is not None:
        hand_bank, hand_uvs, hand_texs = html
    else:
        hand_bank = synthetic_hand_color_bank(n_tex)
        hand_uvs, hand_texs = synthetic_hand_textures(
            mano_model.v_template, n_tex)
    return RenderAssets(
        hand_faces=mano_model.faces,
        hand_color_bank=hand_bank,
        backgrounds=backgrounds if backgrounds is not None
        else synthetic_backgrounds(n_bg, size=bg_size),
        hand_uvs=hand_uvs,
        hand_textures=hand_texs,
    )


def compose_scene_arrays(
    hand_verts: jnp.ndarray,    # (B, Vh, 3) camera space
    hand_colors: jnp.ndarray,   # (B, Vh, 3)
    hand_faces: jnp.ndarray,    # (Fh, 3)
    overts_can: jnp.ndarray,    # (B, Vo, 3)
    ocolors: jnp.ndarray,       # (B, Vo, 3)
    ofaces: jnp.ndarray,        # (B, Fo, 3)
    ofvalid: jnp.ndarray,       # (B, Fo)
    obj_pose: jnp.ndarray,      # (B, 4, 4)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (verts (B, V, 3), colors (B, V, 3), faces (B, F, 3), face_valid)."""
    B = hand_verts.shape[0]
    overts = (
        jnp.einsum("bij,bnj->bni", obj_pose[:, :3, :3], overts_can)
        + obj_pose[:, None, :3, 3]
    )
    verts = jnp.concatenate([hand_verts, overts], axis=1)
    colors = jnp.concatenate([hand_colors, ocolors], axis=1)
    n_hand = hand_verts.shape[1]
    faces = jnp.concatenate(
        [jnp.broadcast_to(hand_faces[None], (B,) + hand_faces.shape),
         ofaces + n_hand], axis=1)
    fvalid = jnp.concatenate(
        [jnp.ones((B, hand_faces.shape[0]), jnp.float32), ofvalid], axis=1)
    return verts, colors, faces, fvalid


def compose_scene(
    hand_verts: jnp.ndarray,    # (B, 778, 3) camera space
    hand_colors: jnp.ndarray,   # (B, 778, 3)
    hand_faces: jnp.ndarray,    # (Fh, 3)
    obj_lib: ObjectLibrary,
    obj_id: jnp.ndarray,        # (B,)
    obj_pose: jnp.ndarray,      # (B, 4, 4)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full-resolution scene composition (see compose_scene_arrays)."""
    return compose_scene_arrays(
        hand_verts, hand_colors, hand_faces,
        obj_lib.verts[obj_id], obj_lib.colors[obj_id],
        obj_lib.faces[obj_id], obj_lib.face_valid[obj_id], obj_pose)


class SceneLOD(NamedTuple):
    """Render-only decimated geometry (supervision tensors stay full-res).

    Built once at asset-load time (``build_scene_lod``); the synth
    pipeline gathers hand LOD verts straight out of the MANO FK output
    (``decimate_topology`` representatives) and uses cluster-mean object
    meshes. Rationale + quality bounds: ops/decimate.py docstring."""

    hand_rep: jnp.ndarray        # (Vh',) int32 into the 778 MANO verts
    hand_faces: jnp.ndarray      # (Fh', 3) int32 in rep space
    hand_bank: jnp.ndarray       # (n_tex, Vh', 3) LOD hand color bank
    obj_verts: jnp.ndarray       # (n_obj, VL, 3) canonical, padded
    obj_colors: jnp.ndarray      # (n_obj, VL, 3)
    obj_faces: jnp.ndarray       # (n_obj, FL, 3) int32, padded
    obj_face_valid: jnp.ndarray  # (n_obj, FL)
    incidence: Optional[jnp.ndarray]  # (n_obj, Vh'+VL, D) normal tables
    hand_uv_bank: Optional[jnp.ndarray] = None  # (n_tex, Vh', 2)
    obj_uvs: Optional[jnp.ndarray] = None       # (n_obj, VL, 2)


def build_scene_lod(
    hand_template: np.ndarray,   # (778, 3) MANO rest verts
    hand_faces: np.ndarray,      # (Fh, 3)
    hand_color_bank: jnp.ndarray,  # (n_tex, 778, 3)
    obj_lib: ObjectLibrary,
    target_faces: int,
    hand_uv_bank: Optional[jnp.ndarray] = None,  # (n_tex, 778, 2)
) -> SceneLOD:
    """Decimate hand + every object to <= target_faces each (host)."""
    from artiboost_tpu.ops.decimate import decimate_mesh, decimate_topology

    rep, hf = decimate_topology(np.asarray(hand_template),
                                np.asarray(hand_faces), target_faces)
    bank = jnp.asarray(np.asarray(hand_color_bank)[:, rep])
    h_uv = (jnp.asarray(np.asarray(hand_uv_bank)[:, rep])
            if hand_uv_bank is not None else None)

    has_uv = obj_lib.uvs is not None
    meshes = []
    for o in range(obj_lib.n_obj):
        fv = np.asarray(obj_lib.face_valid[o]) > 0
        vv = int(obj_lib.n_verts[o])
        attrs = np.asarray(obj_lib.colors[o])[:vv]
        if has_uv:  # decimate uv alongside color (cluster means)
            attrs = np.concatenate(
                [attrs, np.asarray(obj_lib.uvs[o])[:vv]], axis=1)
        v, f, c = decimate_mesh(
            np.asarray(obj_lib.verts[o])[:vv],
            np.asarray(obj_lib.faces[o])[fv],
            target_faces, attrs)
        meshes.append((v, f, c))
    VL = max(m[0].shape[0] for m in meshes)
    FL = max(m[1].shape[0] for m in meshes)
    n = len(meshes)
    overts = np.zeros((n, VL, 3), np.float32)
    ocol = np.full((n, VL, 3), 0.6, np.float32)
    ouv = np.zeros((n, VL, 2), np.float32) if has_uv else None
    ofaces = np.zeros((n, FL, 3), np.int32)
    ofval = np.zeros((n, FL), np.float32)
    for o, (v, f, c) in enumerate(meshes):
        overts[o, :v.shape[0]] = v
        if c is not None:
            ocol[o, :v.shape[0]] = c[:, :3]
            if has_uv:
                ouv[o, :v.shape[0]] = c[:, 3:5]
        ofaces[o, :f.shape[0]] = f
        ofval[o, :f.shape[0]] = 1.0

    # gather-only vertex-normal tables over the LOD topology
    n_hand = rep.shape[0]
    tables = []
    for o in range(n):
        faces = np.concatenate([hf, ofaces[o] + n_hand], axis=0)
        tables.append(build_face_incidence(faces, n_hand + VL))
    D = max(t.shape[1] for t in tables)
    F_tot = hf.shape[0] + FL
    inc = None
    if D <= 64:
        inc = jnp.asarray(np.stack([
            np.pad(t, ((0, 0), (0, D - t.shape[1])), constant_values=F_tot)
            for t in tables]))
    return SceneLOD(
        hand_rep=jnp.asarray(rep), hand_faces=jnp.asarray(hf), hand_bank=bank,
        obj_verts=jnp.asarray(overts), obj_colors=jnp.asarray(ocol),
        obj_faces=jnp.asarray(ofaces), obj_face_valid=jnp.asarray(ofval),
        incidence=inc,
        hand_uv_bank=h_uv,
        obj_uvs=None if ouv is None else jnp.asarray(ouv),
    )


def build_scene_incidence(hand_faces, obj_lib: ObjectLibrary,
                          n_hand: int = 778) -> jnp.ndarray:
    """(n_obj, V_total, D) per-object face-incidence tables for the
    composed hand+object scene (host precompute, once per object set) —
    feeds ``vertex_normals_indexed`` so the per-frame normal pass is
    gather-only (the scatter-add costs ~17% of the synth pipeline)."""
    import numpy as np

    hf = np.asarray(hand_faces)
    v_total = n_hand + obj_lib.verts.shape[1]
    tables = []
    for o in range(obj_lib.faces.shape[0]):
        of = np.asarray(obj_lib.faces[o]) + n_hand
        faces = np.concatenate([hf, of], axis=0)
        tables.append(build_face_incidence(faces, v_total))
    D = max(t.shape[1] for t in tables)
    F = hf.shape[0] + obj_lib.faces.shape[1]
    padded = [np.pad(t, ((0, 0), (0, D - t.shape[1])), constant_values=F)
              for t in tables]
    return jnp.asarray(np.stack(padded))


def _gaussian_blur(img: jnp.ndarray, sigma: jnp.ndarray, radius: int = 3) -> jnp.ndarray:
    """Separable gaussian blur with per-sample sigma (B, H, W, 3).
    dtype-preserving: a bf16 image stays bf16 throughout (the synth
    pipeline runs its post-render image passes in bf16, see synth_batch)."""
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x[None, :] / jnp.maximum(sigma[:, None], 1e-3)) ** 2)  # (B, K)
    k = (k / jnp.sum(k, axis=1, keepdims=True)).astype(img.dtype)

    def blur_one(im, kk):
        imh = jnp.pad(im, ((radius, radius), (0, 0), (0, 0)), mode="edge")
        out = sum(imh[i:i + im.shape[0]] * kk[i] for i in range(2 * radius + 1))
        outw = jnp.pad(out, ((0, 0), (radius, radius), (0, 0)), mode="edge")
        return sum(outw[:, i:i + im.shape[1]] * kk[i] for i in range(2 * radius + 1))

    return jax.vmap(blur_one)(img, k)


class SceneTextures(NamedTuple):
    """Per-pixel texturing inputs for ``render_scene`` (VERDICT r2 item 2
    — parity with the reference's per-fragment GL texture sampling,
    ``anakin/utils/renderer.py:52-55``, ``frender_utils.py:27-46``)."""

    atlas: jnp.ndarray      # (P, T, T, 3) texture pages (hand bank + objects)
    hand_page: jnp.ndarray  # (B,) page id for faces < n_hand_faces
    obj_page: jnp.ndarray   # (B,) page id for object faces
    uv: jnp.ndarray         # (B, V, 2) per-vertex texture coords in [0, 1]
    n_hand_faces: int       # static: face-id split between hand and object
    n_hand_verts: int = 778  # static: vertex-id split (page vertex attr)


def shade_intensity(
    verts: jnp.ndarray,       # (B, V, 3)
    normals: jnp.ndarray,     # (B, V, 3)
    ambient: float,
    light_pos: jnp.ndarray,   # (L, 3)
    light_intensity: jnp.ndarray,  # (B, L)
    max_shade: float = 4.0,
) -> jnp.ndarray:
    """Unclipped scalar Lambert shade per vertex (B, V): the texture
    multiply happens per PIXEL afterwards, and GL clamps only the final
    framebuffer value — clamping shade at 1 here would kill highlights on
    dark texels. Bounded at ``max_shade`` (the kernel packs shade/4 into
    16 bits)."""
    to_light = light_pos[None, :, None] - verts[:, None]  # (B, L, V, 3)
    dist2 = jnp.sum(to_light * to_light, axis=-1)
    dirn = to_light / jnp.maximum(jnp.sqrt(dist2)[..., None], 1e-8)
    lam = jnp.abs(jnp.einsum("blvk,bvk->blv", dirn, normals))
    contrib = light_intensity[..., None] * lam / jnp.maximum(dist2, 1e-4)
    return jnp.clip(ambient + jnp.sum(contrib, axis=1), 0.0, max_shade)


def sample_textures(
    uv_packed: jnp.ndarray,   # (B, H, W) u12*4096 + v12 from the kernel
    shade: jnp.ndarray,       # (B, H, W) in [0, 4]
    page: jnp.ndarray,        # (B, H, W) int32 texture-page id (from the
                              # kernel's page attribute channel)
    tex: SceneTextures,
    bilinear: bool = False,
    subsample: int = 1,
) -> jnp.ndarray:
    """Per-pixel texture gather + shade multiply -> rgb (B, H, W, 3).

    TPU gather formulation (measured on-chip, script/probe_gather.py):
    per-row gathers of 3 floats cost ~27 ms and per-scalar gathers 50 ms
    at B=128 @224^2, but gathering whole 128-LANE rows is DMA-shaped and
    costs 16 ms — so the atlas is rgb888-packed into (P*T*n_win, 128)
    rows of overlapping stride-127 windows (any texel AND its +1
    neighbour for bilinear live at lane <= 127 of window tx // 127), one
    row gather per pixel + a one-hot lane reduction on the VPU.

    Default is nearest-texel. Bilinear costs a second row gather +
    per-channel two-hot reduces; at a 224^2 render-at-crop the texel
    density of 256^2 pages exceeds pixel density, so nearest matches GL
    bilinear to within the quantization floor almost everywhere.

    ``subsample`` s > 1 fetches ALBEDO once per s x s pixel quad (the
    row gather is the dominant texture cost — traffic drops s^2 x) and
    nearest-upsamples it; shade/depth/silhouettes stay per-pixel. The
    quad's representative is its max (page, uv) pack, so a quad touching
    a silhouette picks a FOREGROUND pixel's texel, never background
    garbage. Quality is bounded by the texture's own per-texel gradient
    (measured: see docs/PERF.md round 4)."""
    P, T = tex.atlas.shape[0], tex.atlas.shape[1]
    # the quad-subsample pack below shifts page into bits 24..30 of an
    # int32: page >= 128 would overflow into the sign bit and jnp.max
    # would then prefer LOW pages over high ones (ADVICE r4)
    assert P <= 128, f"texture atlas has {P} pages; pack supports <= 128"
    full_shape = page.shape
    if subsample > 1:
        s = subsample
        B_, H_, W_ = full_shape
        assert H_ % s == 0 and W_ % s == 0, (full_shape, s)
        # pack (page8, u12v12) into one int32 (quv < 2^24 exactly): one
        # max over the quad picks a consistent (page, texel) pair, and
        # background (page 0, quv 0) loses to any foreground pixel
        ci = (page.astype(jnp.int32) << 24) | uv_packed.astype(jnp.int32)
        ci = ci.reshape(B_, H_ // s, s, W_ // s, s)
        ci = jnp.max(jnp.max(ci, axis=4), axis=2)  # (B, H/s, W/s)
        page = ci >> 24
        uv_packed = (ci & 0x00FFFFFF).astype(jnp.float32)
    n_win = max(1, -(-(T - 1) // 127))
    # pack once per program — constants under jit, XLA hoists this
    a8 = jnp.floor(jnp.clip(tex.atlas, 0.0, 1.0) * 255.0 + 0.5)
    q = a8[..., 0] * 65536.0 + a8[..., 1] * 256.0 + a8[..., 2]  # (P, T, T)
    qpad = jnp.pad(q, ((0, 0), (0, 0), (0, (n_win - 1) * 127 + 128 - T)))
    rows = jnp.stack([qpad[:, :, w * 127:w * 127 + 128] for w in range(n_win)],
                     axis=2).reshape(P * T * n_win, 128)

    u = jnp.floor(uv_packed * (1.0 / 4096.0)) * (1.0 / 4095.0)
    v = (uv_packed - jnp.floor(uv_packed * (1.0 / 4096.0)) * 4096.0) * (1.0 / 4095.0)
    tx = u * (T - 1)
    ty = (1.0 - v) * (T - 1)  # same convention as the vertex-color bake
    shape = page.shape
    N = int(np.prod(shape))
    pflat = page.reshape(-1)
    it = jax.lax.broadcasted_iota(jnp.int32, (N, 128), 1)

    def fetch_rows(win, iy):  # window id (N,), texel row (N,) -> (N, 128)
        return rows[(pflat * T + iy) * n_win + win]

    def unpack(qv):
        r8 = jnp.floor(qv * (1.0 / 65536.0))
        g8 = jnp.floor((qv - r8 * 65536.0) * (1.0 / 256.0))
        b8 = qv - r8 * 65536.0 - g8 * 256.0
        return r8, g8, b8

    if not bilinear:
        ix = jnp.round(tx).astype(jnp.int32).reshape(-1)
        iy = jnp.round(ty).astype(jnp.int32).reshape(-1)
        win = jnp.minimum(ix // 127, n_win - 1)
        r = fetch_rows(win, iy)
        qv = jnp.sum(jnp.where(it == (ix - win * 127)[:, None], r, 0.0), -1)
        albedo = jnp.stack(unpack(qv), -1)
    else:
        x0 = jnp.clip(jnp.floor(tx).astype(jnp.int32), 0, T - 2)
        y0 = jnp.clip(jnp.floor(ty).astype(jnp.int32), 0, T - 2)
        wx = jnp.clip(tx - x0, 0.0, 1.0).reshape(-1)[:, None]
        wy = jnp.clip(ty - y0, 0.0, 1.0).reshape(-1)[:, None]
        win = jnp.minimum(x0 // 127, n_win - 1).reshape(-1)
        lane0 = (x0.reshape(-1) - win * 127)[:, None]
        # packed rgb888 can't blend — unpack the gathered rows (cheap VPU
        # ops on (N, 128)), then one two-hot weighted reduce per channel
        sel = (jnp.where(it == lane0, 1.0 - wx, 0.0)
               + jnp.where(it == lane0 + 1, wx, 0.0))
        a0 = jnp.stack([jnp.sum(sel * c, -1)
                        for c in unpack(fetch_rows(win, y0.reshape(-1)))], -1)
        a1 = jnp.stack([jnp.sum(sel * c, -1)
                        for c in unpack(fetch_rows(win, y0.reshape(-1) + 1))], -1)
        albedo = (1.0 - wy) * a0 + wy * a1
    albedo = albedo.reshape(shape + (3,)) * (1.0 / 255.0)
    if subsample > 1:
        albedo = jnp.repeat(jnp.repeat(albedo, subsample, axis=1),
                            subsample, axis=2)
    return jnp.clip(albedo * shade[..., None], 0.0, 1.0)


def _motion_blur_h(img: jnp.ndarray, k: int) -> jnp.ndarray:
    """Horizontal box blur of width k (B, H, W, 3) — the reference's
    motion-blur kernel is exactly a centered horizontal line of ones/k
    (``anakin/utils/renderer.py:32-37``)."""
    r = k // 2
    pad = jnp.pad(img, ((0, 0), (0, 0), (r, k - 1 - r), (0, 0)), mode="edge")
    W = img.shape[2]
    return sum(pad[:, :, i:i + W] for i in range(k)) * (1.0 / k)


def _color_jitter(img: jnp.ndarray, key: jax.Array,
                  brightness=0.3, contrast=0.3, saturation=0.3) -> jnp.ndarray:
    B = img.shape[0]
    kb, kc, ks = jax.random.split(key, 3)
    dt = img.dtype  # dtype-preserving (bf16 image path, see synth_batch)
    b = jax.random.uniform(kb, (B, 1, 1, 1), minval=1 - brightness,
                           maxval=1 + brightness).astype(dt)
    c = jax.random.uniform(kc, (B, 1, 1, 1), minval=1 - contrast,
                           maxval=1 + contrast).astype(dt)
    s = jax.random.uniform(ks, (B, 1, 1, 1), minval=1 - saturation,
                           maxval=1 + saturation).astype(dt)
    img = img * b
    mean = jnp.mean(img, axis=(1, 2, 3), keepdims=True)
    img = (img - mean) * c + mean
    gray = jnp.mean(img, axis=-1, keepdims=True)
    img = (img - gray) * s + gray
    return jnp.clip(img, 0.0, 1.0)


def render_scene(
    verts: jnp.ndarray,        # (B, V, 3) camera space
    colors: jnp.ndarray,       # (B, V, 3)
    faces: jnp.ndarray,        # (B, F, 3)
    face_valid: jnp.ndarray,   # (B, F)
    intr: jnp.ndarray,         # (B, 3, 3)
    backgrounds: jnp.ndarray,  # (n_bg, Hb, Wb, 3)
    key: jax.Array,
    height: int,
    width: int,
    ambient: float = 0.8,
    cull_backfaces: bool = True,   # pyrender culls by default (parity);
                                   # all in-tree meshes are outward-wound.
                                   # +7.7% synth (script/probe_cull.py)
    incidence: Optional[jnp.ndarray] = None,  # (B, V, D) gather-only normals
    motion_blur: int = 0,          # horizontal box-blur width; 0 = off
                                   # (the reference default, renderer.py:101)
    motion_blur_prob: float = 1.0,
    tile_px: Optional[int] = None,  # kernel tile shape overrides (probes;
    sub_k: Optional[int] = None,    # None = measured per-resolution auto)
    texturing: Optional[SceneTextures] = None,  # per-pixel UV sampling
    bilinear: bool = False,
    tex_subsample: int = 1,  # albedo fetch once per s x s quad (see
                             # sample_textures; shade stays per-pixel)
    out_size: Optional[Tuple[int, int]] = None,  # quad-rate raster: the
                             # foreground renders at (height, width) and
                             # nearest-upsamples to out_size BEFORE the
                             # background composite, so the bg crop stays
                             # per-pixel exact (SynthConfig.render_scale)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shade + rasterize + composite -> (rgb (B, H, W, 3), depth)."""
    B = verts.shape[0]
    k_light, k_bg, k_pos, k_mb = jax.random.split(key, 4)

    # random point light, intensity U(1, 5) (renderer.py:104)
    light_int = jax.random.uniform(k_light, (B, 1), minval=1.0, maxval=5.0) * 0.05
    if incidence is not None:
        normals = vertex_normals_indexed(verts, faces, incidence)
    else:
        normals = jax.vmap(vertex_normals)(verts, faces)
    light_pos = jnp.asarray([[0.3, -0.3, -0.3]])

    vs = jax.vmap(
        lambda v, K: project_verts(v, K[0, 0], K[1, 1], K[0, 2], K[1, 2])
    )(verts, intr)
    if texturing is not None:
        # per-pixel UV path: interpolate (u, v, shade, page) planes in
        # the kernel, gather texels + shade-multiply in XLA afterwards.
        # page is a per-vertex constant (hand vs object bank id) so the
        # winning-face unsort gather is never needed (XLA DCEs it)
        s = shade_intensity(verts, normals, ambient, light_pos, light_int)
        vp = jnp.where(
            jnp.arange(verts.shape[1])[None, :] < texturing.n_hand_verts,
            texturing.hand_page[:, None].astype(jnp.float32),
            texturing.obj_page[:, None].astype(jnp.float32))
        attrs = jnp.concatenate(
            [texturing.uv, s[..., None], vp[..., None]], axis=-1)
        quv, sh, pg, _win, depth = rasterize_batch_pallas(
            vs, attrs, faces, face_valid, height, width,
            cull_backfaces=cull_backfaces, tile_px=tile_px, sub_k=sub_k,
            uv_mode=True)
        rgb = sample_textures(quv, sh, pg, texturing, bilinear=bilinear,
                              subsample=tex_subsample)
    else:
        shaded = jax.vmap(
            lambda v, n, c, li: shade_vertices(
                v, n, c, ambient=ambient, light_pos=light_pos,
                light_intensity=li, light_color=jnp.ones((1, 3)))
        )(verts, normals, colors, light_int)
        rgb, depth = rasterize_batch_pallas(vs, shaded, faces, face_valid,
                                            height, width,
                                            cull_backfaces=cull_backfaces,
                                            tile_px=tile_px, sub_k=sub_k)

    # motion blur runs on the raw render BEFORE bg compositing, exactly
    # like the reference (renderer.py:113-116: filter2D on color, then
    # putmask the depth==0 pixels with the background)
    if motion_blur > 1:
        blurred = _motion_blur_h(rgb, motion_blur)
        apply = jax.random.uniform(k_mb, (B,)) < motion_blur_prob
        rgb = jnp.where(apply[:, None, None, None], blurred, rgb)

    if out_size is not None and tuple(out_size) != (height, width):
        oh, ow = out_size
        assert oh % height == 0 and ow % width == 0, (out_size, height, width)
        ry, rx = oh // height, ow // width
        rgb = jnp.repeat(jnp.repeat(rgb, ry, axis=1), rx, axis=2)
        depth = jnp.repeat(jnp.repeat(depth, ry, axis=1), rx, axis=2)
        height, width = oh, ow

    # random background crop (renderer.py:111-136): random position of a
    # fixed-size window in the 1.5x bank image. TPU note: a vmapped
    # dynamic_slice (unaligned per-sample starts) measured 53 ms @ B=128 —
    # instead the window offsets are quantized to a small static grid, the
    # crops materialize via STATIC slices, and the per-sample pick is one
    # contiguous gather (~1 ms). Offset quantization is an augmentation-
    # diversity tradeoff only (deliberate divergence, docs/ARCHITECTURE.md).
    n_bg, Hb, Wb, _ = backgrounds.shape
    gy = np.unique(np.linspace(0, Hb - height, 4).round().astype(np.int32))
    gx = np.unique(np.linspace(0, Wb - width, 4).round().astype(np.int32))
    crops = jnp.stack([backgrounds[:, oy:oy + height, ox:ox + width]
                       for oy in gy for ox in gx])  # (G, n_bg, H, W, 3)
    cid = jax.random.randint(k_pos, (B,), 0, len(gy) * len(gx))
    bid = jax.random.randint(k_bg, (B,), 0, n_bg)
    bg = crops[cid, bid]

    mask = (depth > 0)[..., None]
    return jnp.where(mask, rgb, bg), depth
