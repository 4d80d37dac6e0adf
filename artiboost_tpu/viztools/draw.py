"""Host-side qualitative visualization: 2D skeleton / corner-cube overlays,
3D skeleton plots, and a projective wireframe mesh renderer.

Parity: ``anakin/viztools/draw.py`` (matplotlib skeletons, :34,149) and
``anakin/viztools/opendr_renderer.py`` (offline mesh viz) — replaced here
by pure numpy+PIL drawing (no GL / OpenDR dependency): overlays stay on
the host, the TPU never sees this code path.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from PIL import Image, ImageDraw

from artiboost_tpu.utils.misc import CONST

# one color per finger (thumb, index, middle, ring, pinky)
FINGER_COLORS = ["#e6194b", "#3cb44b", "#4363d8", "#f58231", "#911eb4"]
CORNER_COLOR = "#00ffff"


def project_points(pts3d: np.ndarray, intr: np.ndarray) -> np.ndarray:
    """Perspective-project camera-space points (N, 3) with intrinsics (3, 3)."""
    hom = intr @ pts3d.T  # (3, N)
    return (hom[:2] / np.maximum(hom[2:], 1e-8)).T


def draw_skeleton_2d(img: Image.Image, joints_2d: np.ndarray,
                     point_radius: int = 2, width: int = 2) -> Image.Image:
    """Draw the 21-joint hand skeleton (bones colored per finger)."""
    draw = ImageDraw.Draw(img)
    parents = CONST.JOINTS_IDX_PARENTS
    for i in range(1, 21):
        p = parents[i]
        color = FINGER_COLORS[(i - 1) // 4]
        draw.line([tuple(joints_2d[p]), tuple(joints_2d[i])], fill=color, width=width)
    for i in range(21):
        x, y = joints_2d[i]
        draw.ellipse([x - point_radius, y - point_radius,
                      x + point_radius, y + point_radius], fill="#ffffff")
    return img


def draw_corners_2d(img: Image.Image, corners_2d: np.ndarray,
                    color: str = CORNER_COLOR, width: int = 2,
                    link_order: Optional[Sequence[int]] = None) -> Image.Image:
    """Draw the 8-corner object bounding cube wireframe."""
    draw = ImageDraw.Draw(img)
    if link_order is not None:
        pairs = list(zip(link_order[:-1], link_order[1:]))
    else:
        pairs = CONST.CORNERCUBE_IDX_ORDER
    for a, b in pairs:
        draw.line([tuple(corners_2d[a]), tuple(corners_2d[b])], fill=color, width=width)
    return img


def draw_mesh_wireframe(img: Image.Image, verts: np.ndarray, faces: np.ndarray,
                        intr: np.ndarray, color: str = "#80d0ff",
                        max_edges: int = 4000) -> Image.Image:
    """Back-to-front painter's wireframe of a camera-space mesh.

    Subsamples faces when the mesh is dense — this is a debugging overlay,
    not the training renderer (that's ops/rasterizer_pallas.py).
    """
    v2d = project_points(verts, intr)
    depth = verts[:, 2]
    faces = np.asarray(faces)
    if len(faces) > max_edges:
        faces = faces[np.linspace(0, len(faces) - 1, max_edges).astype(int)]
    order = np.argsort(-depth[faces].mean(axis=1))  # far first
    draw = ImageDraw.Draw(img)
    for f in faces[order]:
        a, b, c = v2d[f[0]], v2d[f[1]], v2d[f[2]]
        draw.line([tuple(a), tuple(b), tuple(c), tuple(a)], fill=color, width=1)
    return img


def render_mesh_overlay(img: Image.Image, meshes, intr: np.ndarray,
                        alpha: float = 0.65, ambient: float = 0.55,
                        light_intensity: float = 0.06) -> Image.Image:
    """Solid-shaded mesh overlay (parity: the reference renders filled
    hand/object meshes over eval images via OpenDR,
    ``anakin/viztools/opendr_renderer.py:11`` +
    ``anakin/submit/hodata_submit_epoch_pass.py:158-222``).

    ``meshes``: sequence of (verts_cam (V, 3), faces (F, 3), rgb 3-tuple
    in [0, 1]). All meshes rasterize into ONE scene so the z-test
    resolves hand/object occlusion, exactly like the reference's single
    OpenDR scene. Runs the in-tree XLA reference rasterizer on the host
    CPU — the TPU never sees this debug path."""
    import jax
    import jax.numpy as jnp

    from artiboost_tpu.ops.rasterizer import (
        project_verts, rasterize_batch, shade_vertices, vertex_normals)

    W, H = img.size
    all_v, all_c, all_f, off = [], [], [], 0
    for verts, faces, color in meshes:
        verts = np.asarray(verts, np.float32)
        all_v.append(verts)
        all_c.append(np.tile(np.asarray(color, np.float32)[None],
                             (verts.shape[0], 1)))
        all_f.append(np.asarray(faces, np.int32) + off)
        off += verts.shape[0]
    verts = jnp.asarray(np.concatenate(all_v))
    colors = jnp.asarray(np.concatenate(all_c))
    faces = jnp.asarray(np.concatenate(all_f))

    normals = vertex_normals(verts, faces)
    # a point light at the camera keeps every view lit
    shaded = shade_vertices(
        verts, normals, colors, ambient=ambient,
        light_pos=jnp.asarray([[0.0, 0.0, 0.0]]),
        light_intensity=jnp.asarray([light_intensity]),
        light_color=jnp.ones((1, 3)))
    intr = np.asarray(intr)
    vs = project_verts(verts, intr[0, 0], intr[1, 1], intr[0, 2], intr[1, 2])
    rgb, depth = rasterize_batch(vs[None], shaded[None], faces, None, H, W,
                                 face_chunk=min(256, int(faces.shape[0])),
                                 row_chunk=16)
    rgb = np.asarray(rgb[0])
    mask = (np.asarray(depth[0]) > 0)[..., None].astype(np.float32) * alpha

    base = np.asarray(img, np.float32) / 255.0
    out = base * (1.0 - mask) + rgb * mask
    blended = Image.fromarray((out * 255).clip(0, 255).astype(np.uint8))
    img.paste(blended)
    return img


def plot_skeleton_3d(joints_3d: np.ndarray, corners_3d: Optional[np.ndarray] = None,
                     save_path: Optional[str] = None):
    """3D matplotlib figure of the hand skeleton (+ optional corner cube)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(5, 5))
    ax = fig.add_subplot(111, projection="3d")
    parents = CONST.JOINTS_IDX_PARENTS
    for i in range(1, 21):
        p = parents[i]
        seg = joints_3d[[p, i]]
        ax.plot(seg[:, 0], seg[:, 1], seg[:, 2],
                color=FINGER_COLORS[(i - 1) // 4])
    ax.scatter(joints_3d[:, 0], joints_3d[:, 1], joints_3d[:, 2], s=8, c="k")
    if corners_3d is not None:
        for a, b in CONST.CORNERCUBE_IDX_ORDER:
            seg = corners_3d[[a, b]]
            ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], color=CORNER_COLOR)
    ax.set_box_aspect([1, 1, 1])
    if save_path:
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig


def plot_mesh_3d(verts: np.ndarray, faces: np.ndarray,
                 joints_3d: Optional[np.ndarray] = None,
                 corners_3d: Optional[np.ndarray] = None,
                 save_path: Optional[str] = None,
                 color: str = "#c9a186"):
    """3D inspection figure of a hand/object mesh (+ optional skeleton and
    corner cube) — the matplotlib equivalent of the reference's mayavi
    ``viz_hand_object`` (``anakin/viztools/draw.py:236``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")
    verts = np.asarray(verts)
    ax.plot_trisurf(verts[:, 0], verts[:, 1], verts[:, 2],
                    triangles=np.asarray(faces), color=color,
                    edgecolor="none", alpha=0.95, shade=True)
    if joints_3d is not None:
        parents = CONST.JOINTS_IDX_PARENTS
        for i in range(1, 21):
            seg = joints_3d[[parents[i], i]]
            ax.plot(seg[:, 0], seg[:, 1], seg[:, 2],
                    color=FINGER_COLORS[(i - 1) // 4])
    if corners_3d is not None:
        for a, b in CONST.CORNERCUBE_IDX_ORDER:
            seg = corners_3d[[a, b]]
            ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], color=CORNER_COLOR)
    ax.set_box_aspect([1, 1, 1])
    if save_path:
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig


def image_grid(images: Sequence[np.ndarray], ncol: int = 4) -> Image.Image:
    """Tile uint8 (H, W, 3) images into one grid image."""
    n = len(images)
    nrow = (n + ncol - 1) // ncol
    H, W = images[0].shape[:2]
    grid = Image.new("RGB", (ncol * W, nrow * H))
    for i, im in enumerate(images):
        grid.paste(Image.fromarray(np.asarray(im)), ((i % ncol) * W, (i // ncol) * H))
    return grid


def save_image(img, path: str) -> None:
    if isinstance(img, np.ndarray):
        img = Image.fromarray(img)
    img.save(path)
