"""Batched triangle rasterization in pure XLA.

TPU-native replacement for the reference's pyrender/EGL GPU render farm
(``anakin/utils/renderer.py:101-136``, ``anakin/artiboost/render_infra.py``).
Instead of a scanline GPU pipeline behind a process boundary, rendering
is expressed as dense tensor math that XLA maps onto the VPU/MXU:

  1. vertices are projected and shaded **per-vertex** (Gouraud: ambient +
     point lights on vertex normals, texture pre-baked to vertex colors),
  2. every (pixel, face) pair evaluates three edge functions — linear in
     pixel coords, so a face chunk is an outer product over the tile,
  3. perspective-correct barycentric interpolation of (1/z, rgb/z),
  4. a running min-z select over face chunks gives the visible surface.

This file is the jit-able reference implementation (chunked to bound
memory); ``rasterizer_pallas.py`` holds the fused Pallas kernel with the
same contract, validated against this and against a numpy scanline
golden raster in tests.

Conventions: CV camera (x right, y down, z forward > 0); pixel centers
at integer + 0.5; faces (F, 3) shared across the batch with a validity
mask (padding-friendly); winding-agnostic inside test (no backface
culling, z-test resolves closed meshes).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-9
_BIG = 1e30


class ScreenFace(NamedTuple):
    """Per-face quantities prepared once per image, consumed per tile."""

    edge_a: jnp.ndarray    # (F, 3) edge coefficients: e_k = a_k x + b_k y + c_k
    edge_b: jnp.ndarray    # (F, 3)
    edge_c: jnp.ndarray    # (F, 3)
    inv_z: jnp.ndarray     # (F, 3) per-vertex 1/z
    attr_over_z: jnp.ndarray  # (F, 3, A) per-vertex attr/z
    valid: jnp.ndarray     # (F,) 1 = rasterize this face
    bbox: jnp.ndarray      # (F, 4) xmin, ymin, xmax, ymax in pixels


def project_verts(verts_cam: jnp.ndarray, fx, fy, cx, cy) -> jnp.ndarray:
    """(..., V, 3) camera-space -> (..., V, 3) (x_pix, y_pix, z_cam)."""
    z = jnp.maximum(verts_cam[..., 2], 1e-6)
    x = verts_cam[..., 0] / z * fx + cx
    y = verts_cam[..., 1] / z * fy + cy
    return jnp.stack([x, y, z], axis=-1)


def build_screen_faces(
    verts_screen: jnp.ndarray,  # (V, 3) x_pix, y_pix, z
    vert_attrs: jnp.ndarray,    # (V, A) attributes to interpolate (e.g. rgb)
    faces: jnp.ndarray,         # (F, 3) int32
    face_valid: Optional[jnp.ndarray] = None,  # (F,)
    cull_backfaces: bool = False,
) -> ScreenFace:
    v = verts_screen[faces]  # (F, 3, 3)
    a = vert_attrs[faces]    # (F, 3, A)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]

    # signed doubled area; orient all faces positive (winding-agnostic)
    area = (x[:, 1] - x[:, 0]) * (y[:, 2] - y[:, 0]) - (x[:, 2] - x[:, 0]) * (y[:, 1] - y[:, 0])
    flip = jnp.where(area < 0, -1.0, 1.0)
    inv_area = flip / jnp.where(jnp.abs(area) < _EPS, _EPS, jnp.abs(area))

    # edge k opposite vertex k: e_k(p) = cross(v_{k+1} -> v_{k+2}, v_{k+1} -> p)
    k1 = jnp.asarray([1, 2, 0])
    k2 = jnp.asarray([2, 0, 1])
    x1, y1 = x[:, k1], y[:, k1]
    x2, y2 = x[:, k2], y[:, k2]
    # e_k = (x2-x1)*(py-y1) - (y2-y1)*(px-x1)  -> a*px + b*py + c
    ea = -(y2 - y1)
    eb = (x2 - x1)
    ec = (y2 - y1) * x1 - (x2 - x1) * y1
    # scale by inv_area so e_k is the barycentric coordinate lambda_k
    ea = ea * inv_area[:, None]
    eb = eb * inv_area[:, None]
    ec = ec * inv_area[:, None]

    valid = jnp.ones(faces.shape[0], jnp.float32) if face_valid is None else face_valid
    # degenerate faces are never inside
    valid = valid * (jnp.abs(area) > _EPS).astype(jnp.float32)
    if cull_backfaces:
        # consistently-wound meshes (MANO, YCB): screen-space signed area
        # flips sign for faces seen from behind; the z-buffer already hides
        # them, so culling changes nothing visually but halves the face set
        # (invalid faces y-sort to the end and their chunks are skipped).
        # Sign: outward-wound (normal·view < 0 when front-facing) projects
        # to NEGATIVE signed area under the y-down pixel convention of
        # project_verts (verified empirically in tests/test_rasterizer.py)
        valid = valid * (area < 0).astype(jnp.float32)

    inv_z = 1.0 / jnp.maximum(z, 1e-6)
    bbox = jnp.stack([x.min(1), y.min(1), x.max(1), y.max(1)], axis=-1)
    return ScreenFace(
        edge_a=ea, edge_b=eb, edge_c=ec,
        inv_z=inv_z,
        attr_over_z=a * inv_z[..., None],
        valid=valid,
        bbox=bbox,
    )


def _raster_tile(
    sf: ScreenFace,
    px: jnp.ndarray,  # (P,) pixel x centers
    py: jnp.ndarray,  # (P,) pixel y centers
    n_attr: int,
    face_chunk: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rasterize all faces over a flat pixel set -> (depth (P,), attrs (P, A))."""
    F = sf.edge_a.shape[0]
    P = px.shape[0]
    n_chunks = (F + face_chunk - 1) // face_chunk

    def body(i, carry):
        best_w, best_attr = carry  # best_w = max 1/z (closest); attr premult
        s = i * face_chunk
        ea = jax.lax.dynamic_slice_in_dim(sf.edge_a, s, face_chunk, 0)  # (C, 3)
        eb = jax.lax.dynamic_slice_in_dim(sf.edge_b, s, face_chunk, 0)
        ec = jax.lax.dynamic_slice_in_dim(sf.edge_c, s, face_chunk, 0)
        izv = jax.lax.dynamic_slice_in_dim(sf.inv_z, s, face_chunk, 0)  # (C, 3)
        aoz = jax.lax.dynamic_slice_in_dim(sf.attr_over_z, s, face_chunk, 0)  # (C, 3, A)
        val = jax.lax.dynamic_slice_in_dim(sf.valid, s, face_chunk, 0)  # (C,)

        # barycentrics for every (pixel, face, 3): outer-product evaluation
        lam = (
            px[:, None, None] * ea[None] + py[:, None, None] * eb[None] + ec[None]
        )  # (P, C, 3)
        # tiny negative tolerance: pixels exactly on shared edges rasterize
        # in both faces (z-test resolves), avoiding dropout cracks
        inside = jnp.all(lam >= -1e-6, axis=-1) & (val[None, :] > 0)  # (P, C)

        w = jnp.einsum("pck,ck->pc", lam, izv)  # (P, C) interpolated 1/z
        w = jnp.where(inside, w, -_BIG)
        # closest face in this chunk
        best_c = jnp.argmax(w, axis=1)  # (P,)
        w_c = jnp.take_along_axis(w, best_c[:, None], 1)[:, 0]  # (P,)
        lam_c = jnp.take_along_axis(lam, best_c[:, None, None], 1)[:, 0]  # (P, 3)
        aoz_c = aoz[best_c]  # (P, 3, A) attrs of the chunk-best face
        attr_c = jnp.einsum("pk,pka->pa", lam_c, aoz_c)  # (P, A) attr/z

        take = w_c > best_w
        best_attr = jnp.where(take[:, None], attr_c, best_attr)
        best_w = jnp.maximum(best_w, w_c)
        return best_w, best_attr

    init = (jnp.full((P,), -_BIG, jnp.float32), jnp.zeros((P, n_attr), jnp.float32))
    best_w, best_attr = jax.lax.fori_loop(0, n_chunks, body, init)

    hit = best_w > 0
    depth = jnp.where(hit, 1.0 / jnp.maximum(best_w, _EPS), 0.0)
    attrs = jnp.where(hit[:, None], best_attr * depth[:, None], 0.0)
    return depth, attrs


@partial(jax.jit, static_argnames=("height", "width", "face_chunk", "row_chunk",
                                   "cull_backfaces"))
def rasterize(
    verts_screen: jnp.ndarray,  # (V, 3)
    vert_attrs: jnp.ndarray,    # (V, A)
    faces: jnp.ndarray,         # (F, 3)
    face_valid: Optional[jnp.ndarray],
    height: int,
    width: int,
    face_chunk: int = 512,
    row_chunk: int = 16,
    cull_backfaces: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (attrs (H, W, A), depth (H, W)); depth 0 = background."""
    sf = build_screen_faces(verts_screen, vert_attrs, faces, face_valid,
                            cull_backfaces=cull_backfaces)
    n_attr = vert_attrs.shape[-1]

    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    ys = jnp.arange(height, dtype=jnp.float32) + 0.5

    def do_rows(y0):
        yy = jax.lax.dynamic_slice_in_dim(ys, y0, row_chunk, 0)
        py, px = jnp.meshgrid(yy, xs, indexing="ij")
        d, a = _raster_tile(sf, px.reshape(-1), py.reshape(-1), n_attr, face_chunk)
        return d.reshape(row_chunk, width), a.reshape(row_chunk, width, n_attr)

    n_row_chunks = (height + row_chunk - 1) // row_chunk
    depth, attrs = jax.lax.map(do_rows, jnp.arange(n_row_chunks) * row_chunk)
    return attrs.reshape(height, width, n_attr)[:height], depth.reshape(height, width)[:height]


def rasterize_batch(
    verts_screen: jnp.ndarray,  # (B, V, 3)
    vert_attrs: jnp.ndarray,    # (B, V, A)
    faces: jnp.ndarray,         # (F, 3) shared
    face_valid: Optional[jnp.ndarray],  # (B, F) or None
    height: int,
    width: int,
    face_chunk: int = 512,
    row_chunk: int = 16,
    cull_backfaces: bool = False,
):
    fn = lambda v, a, m: rasterize(v, a, faces, m, height, width, face_chunk,
                                   row_chunk, cull_backfaces)
    if face_valid is None:
        face_valid = jnp.ones((verts_screen.shape[0], faces.shape[0]), jnp.float32)
    return jax.vmap(fn)(verts_screen, vert_attrs, face_valid)


# --------------------------------------------------------------------------
# vertex shading (Gouraud): run BEFORE rasterization, on the VPU
# --------------------------------------------------------------------------


def vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """(V, 3), (F, 3) -> (V, 3) area-weighted vertex normals."""
    v = verts[faces]  # (F, 3, 3)
    fn = jnp.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])  # (F, 3) area-weighted
    vn = jnp.zeros_like(verts)
    for k in range(3):
        vn = vn.at[faces[:, k]].add(fn)
    return vn / jnp.maximum(jnp.linalg.norm(vn, axis=-1, keepdims=True), 1e-8)


def build_face_incidence(faces: np.ndarray, n_verts: int,
                         min_degree: int = 0) -> np.ndarray:
    """Host precompute: (F, 3) int faces -> (V, D) fixed-degree incidence
    lists (face indices per vertex, padded with F as a dummy pointing at
    an implicit zero face normal). Degenerate (padded) faces are skipped.

    This turns the per-frame vertex-normal accumulation from a scatter-add
    (serialized on TPU) into D pure gathers — see
    ``vertex_normals_indexed``."""
    F = faces.shape[0]
    lists: list = [[] for _ in range(n_verts)]
    for fi, f in enumerate(np.asarray(faces)):
        if f[0] == f[1] == f[2]:  # padded / degenerate
            continue
        for vtx in f:
            lists[int(vtx)].append(fi)
    D = max(max((len(l) for l in lists), default=1), min_degree, 1)
    inc = np.full((n_verts, D), F, np.int32)
    for vtx, l in enumerate(lists):
        inc[vtx, : len(l)] = l
    return inc


def vertex_normals_indexed(verts: jnp.ndarray, faces: jnp.ndarray,
                           incidence: jnp.ndarray) -> jnp.ndarray:
    """Batched area-weighted vertex normals via precomputed incidence.

    verts (B, V, 3), faces (B, F, 3), incidence (B, V, D) from
    ``build_face_incidence`` (entries == F select an implicit zero row).
    Identical result to ``vertex_normals`` (same sums, no scatter): the
    scatter-add version costs ~32 ms for B=128 on a v5e chip; this runs
    as D gathers in ~1 ms."""
    v = jax.vmap(lambda vv, ff: vv[ff])(verts, faces)  # (B, F, 3, 3)
    fn = jnp.cross(v[:, :, 1] - v[:, :, 0], v[:, :, 2] - v[:, :, 0])  # (B, F, 3)
    fn_pad = jnp.concatenate([fn, jnp.zeros_like(fn[:, :1])], axis=1)
    gathered = jax.vmap(lambda f, i: f[i])(fn_pad, incidence)  # (B, V, D, 3)
    vn = jnp.sum(gathered, axis=2)  # (B, V, 3)
    return vn / jnp.maximum(jnp.linalg.norm(vn, axis=-1, keepdims=True), 1e-8)


def shade_vertices(
    verts: jnp.ndarray,         # (V, 3) camera space
    normals: jnp.ndarray,       # (V, 3)
    base_color: jnp.ndarray,    # (V, 3) albedo in [0, 1]
    ambient: float | jnp.ndarray = 0.8,
    light_pos: Optional[jnp.ndarray] = None,     # (L, 3)
    light_intensity: Optional[jnp.ndarray] = None,  # (L,)
    light_color: Optional[jnp.ndarray] = None,   # (L, 3)
) -> jnp.ndarray:
    """Lambertian per-vertex shading (parity: pyrender ambient 0.8 +
    point lights with random intensity, renderer.py:78,104)."""
    shade = jnp.asarray(ambient) * jnp.ones_like(base_color)
    if light_pos is not None:
        to_light = light_pos[:, None] - verts[None]  # (L, V, 3)
        dist2 = jnp.sum(to_light * to_light, axis=-1)  # (L, V)
        dirn = to_light / jnp.maximum(jnp.sqrt(dist2)[..., None], 1e-8)
        # two-sided lambert keeps synthetic meshes with flipped normals lit
        lam = jnp.abs(jnp.einsum("lvk,vk->lv", dirn, normals))
        contrib = light_intensity[:, None] * lam / jnp.maximum(dist2, 1e-4)
        shade = shade + jnp.einsum("lv,lc->vc", contrib, light_color)
    return jnp.clip(base_color * shade, 0.0, 1.0)
