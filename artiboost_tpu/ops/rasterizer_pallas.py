"""Fused Pallas TPU kernel for batched triangle rasterization.

Same contract as ``rasterizer.rasterize_batch`` (validated against it in
tests), but fused into one kernel so the (pixel x face) work never
materializes in HBM:

  * grid = (batch, pixel-tiles); each tile is TP flattened pixels,
  * face data is packed as (NC, 24, 128) chunk-major rows so each chunk
    is a natural (sublane, lane) block: rows = [ea0..2, eb0..2, ec0..2,
    iz0..2, r/z0..2, g/z0..2, b/z0..2, valid, ymin, ymax],
  * faces are sorted by screen-y, and a host-computed (batch, tile) ->
    [chunk_start, chunk_end) table is passed through scalar prefetch;
    the kernel's fori_loop runs only over chunks whose y-range can
    touch the tile — real work skipping, unlike a vector-predicated
    lax.cond which Mosaic executes on both paths,
  * per chunk: 3 edge functions via broadcasted FMA (VPU), inside mask,
    interpolated 1/z, masked running max over the lane axis.

Replaces: pyrender EGL rasterizer + render worker processes
(``anakin/utils/renderer.py``, ``anakin/artiboost/render_infra.py``).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from artiboost_tpu.ops.rasterizer import build_screen_faces

_BIG = 1e30
_EPS_EDGE = -1e-6
LANE = 128  # faces per chunk
N_ROWS = 24  # packed rows per chunk (21 used + valid + ymin + ymax)


def _pack_faces(sf, n_chunks: int) -> jnp.ndarray:
    """ScreenFace -> (NC, 24, LANE) packed rows (see module docstring)."""
    F = sf.edge_a.shape[0]
    pad = n_chunks * LANE - F

    def _p(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))

    ea, eb, ec = _p(sf.edge_a), _p(sf.edge_b), _p(sf.edge_c)
    iz = _p(sf.inv_z)
    aoz = _p(sf.attr_over_z)  # (F', 3, 3) rgb
    valid = _p(sf.valid)
    bbox = _p(sf.bbox)

    # fold face validity into the first edge constant: invalid faces get
    # lam0 = -BIG so the inside test rejects them with no extra mask op
    ec0 = jnp.where(valid > 0, ec[:, 0], -_BIG)
    rows = [ea[:, 0], ea[:, 1], ea[:, 2],
            eb[:, 0], eb[:, 1], eb[:, 2],
            ec0, ec[:, 1], ec[:, 2],
            iz[:, 0], iz[:, 1], iz[:, 2],
            aoz[:, 0, 0], aoz[:, 1, 0], aoz[:, 2, 0],
            aoz[:, 0, 1], aoz[:, 1, 1], aoz[:, 2, 1],
            aoz[:, 0, 2], aoz[:, 1, 2], aoz[:, 2, 2],
            valid,
            jnp.where(valid > 0, bbox[:, 1], _BIG),   # ymin
            jnp.where(valid > 0, bbox[:, 3], -_BIG)]  # ymax
    packed = jnp.stack(rows, axis=1)  # (F', 24)
    return packed.reshape(n_chunks, LANE, N_ROWS).transpose(0, 2, 1)


def _raster_kernel(ranges_ref, packed_ref, out_ref, *, width: int, tile_px: int,
                   n_tiles: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    base = t * tile_px
    pix = base + jax.lax.broadcasted_iota(jnp.int32, (tile_px, 1), 0)
    x = (pix % width).astype(jnp.float32) + 0.5  # (TP, 1)
    y = (pix // width).astype(jnp.float32) + 0.5

    # per-lane multiplicative depth bias (<= 1.5e-5 relative) makes the
    # in-chunk argmax a single winner, killing the tie-count reduction;
    # ties across lanes then break toward the higher lane deterministically
    lane_bias = 1.0 + jax.lax.broadcasted_iota(
        jnp.int32, (1, LANE), 1).astype(jnp.float32) * (2.0 ** -23)

    def chunk_body(c, carry):
        best_w, best_r, best_g, best_b = carry
        fd = packed_ref[0, c]  # (24, LANE)
        lam0 = x * fd[0:1, :] + y * fd[3:4, :] + fd[6:7, :]
        lam1 = x * fd[1:2, :] + y * fd[4:5, :] + fd[7:8, :]
        lam2 = x * fd[2:3, :] + y * fd[5:6, :] + fd[8:9, :]
        lmin = jnp.minimum(lam0, jnp.minimum(lam1, lam2))
        w = lam0 * fd[9:10, :] + lam1 * fd[10:11, :] + lam2 * fd[11:12, :]
        w = jnp.where(lmin >= _EPS_EDGE, w * lane_bias, -_BIG)
        m = jnp.max(w, axis=1, keepdims=True)  # (TP, 1)
        improve = m > best_w
        sel = (w == m).astype(jnp.float32)  # single winner (bias breaks ties)

        r = lam0 * fd[12:13, :] + lam1 * fd[13:14, :] + lam2 * fd[14:15, :]
        g = lam0 * fd[15:16, :] + lam1 * fd[16:17, :] + lam2 * fd[17:18, :]
        bch = lam0 * fd[18:19, :] + lam1 * fd[19:20, :] + lam2 * fd[20:21, :]
        r_m = jnp.sum(sel * r, axis=1, keepdims=True)
        g_m = jnp.sum(sel * g, axis=1, keepdims=True)
        b_m = jnp.sum(sel * bch, axis=1, keepdims=True)

        best_r = jnp.where(improve, r_m, best_r)
        best_g = jnp.where(improve, g_m, best_g)
        best_b = jnp.where(improve, b_m, best_b)
        best_w = jnp.maximum(best_w, m)
        return best_w, best_r, best_g, best_b

    init = (
        jnp.full((tile_px, 1), -_BIG, jnp.float32),
        jnp.zeros((tile_px, 1), jnp.float32),
        jnp.zeros((tile_px, 1), jnp.float32),
        jnp.zeros((tile_px, 1), jnp.float32),
    )
    # ranges is flat (B * n_tiles * 2,): SMEM pads trailing dims to the
    # lane width, so a (B, T, 2) layout would blow the 1MB SMEM budget
    rbase = (b * n_tiles + t) * 2
    c_start = ranges_ref[rbase]
    c_end = ranges_ref[rbase + 1]
    best_w, best_r, best_g, best_b = jax.lax.fori_loop(
        c_start, c_end, chunk_body, init
    )

    hitm = best_w > 0.0
    depth = jnp.where(hitm, 1.0 / jnp.maximum(best_w, 1e-30), 0.0)
    out_ref[0, 0, :, 0:1] = best_r * depth
    out_ref[0, 0, :, 1:2] = best_g * depth
    out_ref[0, 0, :, 2:3] = best_b * depth
    out_ref[0, 0, :, 3:4] = depth


@partial(jax.jit, static_argnames=("height", "width", "tile_px", "cull_backfaces"))
def rasterize_batch_pallas(
    verts_screen: jnp.ndarray,  # (B, V, 3)
    vert_attrs: jnp.ndarray,    # (B, V, 3) rgb
    faces: jnp.ndarray,         # (F, 3) shared topology
    face_valid: Optional[jnp.ndarray],  # (B, F) or None
    height: int,
    width: int,
    tile_px: int = 1024,  # 2048 exceeds the 16MB VMEM scoped limit
    cull_backfaces: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (rgb (B, H, W, 3), depth (B, H, W)). depth 0 = background."""
    B, V, _ = verts_screen.shape
    F = faces.shape[-2]
    assert vert_attrs.shape[-1] == 3, "pallas path is specialized to rgb"
    n_chunks = (F + LANE - 1) // LANE
    n_pix = height * width
    n_tiles = (n_pix + tile_px - 1) // tile_px

    if face_valid is None:
        face_valid = jnp.ones((B, F), jnp.float32)

    faces_axis = 0 if faces.ndim == 3 else None  # per-sample topology OK
    sf = jax.vmap(
        partial(build_screen_faces, cull_backfaces=cull_backfaces),
        in_axes=(0, 0, faces_axis, 0),
    )(verts_screen, vert_attrs, faces, face_valid)

    # sort faces by screen-y so each 128-face chunk is y-coherent
    ymin_key = jnp.where(sf.valid > 0, sf.bbox[..., 1], _BIG)  # (B, F)
    order = jnp.argsort(ymin_key, axis=1)
    sf = jax.tree_util.tree_map(
        lambda a: jnp.take_along_axis(
            a, order.reshape(order.shape + (1,) * (a.ndim - 2)), axis=1
        ),
        sf,
    )
    packed = jax.vmap(lambda s: _pack_faces(s, n_chunks))(sf)  # (B, NC, 24, LANE)

    # per-(batch, tile) chunk ranges from the sorted chunk y-extents
    chunk_ymin = jnp.min(packed[:, :, 22, :], axis=-1)  # (B, NC)
    chunk_ymax = jnp.max(packed[:, :, 23, :], axis=-1)  # (B, NC)
    tile_idx = jnp.arange(n_tiles)
    tile_ymin = ((tile_idx * tile_px) // width).astype(jnp.float32)  # (T,)
    tile_ymax = (((tile_idx + 1) * tile_px - 1) // width).astype(jnp.float32) + 1.0
    # end: chunks are ymin-sorted -> first chunk with ymin > tile_ymax bounds
    # the scan; start: prefix chunks whose running-max ymax < tile_ymin are
    # all strictly above the tile
    cummax_ymax = jax.lax.cummax(chunk_ymax, axis=1)  # (B, NC)
    ends = jnp.sum((chunk_ymin[:, None, :] <= tile_ymax[None, :, None]), axis=-1)
    starts = jnp.sum((cummax_ymax[:, None, :] < tile_ymin[None, :, None]), axis=-1)
    ranges = jnp.stack(
        [jnp.minimum(starts, ends), ends], axis=-1
    ).astype(jnp.int32).reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, n_chunks, N_ROWS, LANE), lambda b, t, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tile_px, 4), lambda b, t, *_: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        partial(_raster_kernel, width=width, tile_px=tile_px, n_tiles=n_tiles),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles, tile_px, 4), jnp.float32),
        interpret=jax.default_backend() == "cpu",  # tests run on CPU mesh
    )(ranges, packed)

    flat = out.reshape(B, n_tiles * tile_px, 4)[:, :n_pix]
    img = flat.reshape(B, height, width, 4)
    return img[..., :3], img[..., 3]
