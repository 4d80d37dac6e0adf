"""Fused Pallas TPU kernel for batched triangle rasterization.

Same contract as ``rasterizer.rasterize_batch`` (validated against it in
tests), but fused into one kernel so the (pixel x face) work never
materializes in HBM. Deferred-shading design:

  * grid = (batch, pixel-tiles); each tile is TP flattened pixels,
  * per-face data is packed as (NC, 16, 128) chunk-major rows so each
    chunk is a natural (sublane, lane) block. Every per-pixel quantity
    is a plane in (x, y): barycentrics lam0/lam1 directly
    (lam2 = 1 - lam0 - lam1), 1/z as the plane (ea·iz, eb·iz, ec·iz),
    and each color channel as the plane (ea·(c/z), ...),
  * faces are sorted by screen-y, and a host-computed (batch, tile) ->
    [chunk_start, chunk_end) table is passed through scalar prefetch;
    the kernel's fori_loop runs only over chunks whose y-range can
    touch the tile — real work skipping, unlike a vector-predicated
    lax.cond which Mosaic executes on both paths,
  * pass 1 (depth): the depth test is ONE f32 max per chunk — 1/z is
    bitcast to int32, its low 7 mantissa bits are replaced by the lane
    id (positive floats compare identically as ints; the 2^-17-relative
    depth truncation matches the multiplicative lane bias a previous
    version applied to break ties), and the masked pack is bitcast
    BACK to f32 for the reduction: the VPU's f32 max is fast where the
    int32 max lowering is not (measured 3.4x kernel difference), and
    the patterns stay non-negative so the f32 order matches the int
    order. The winning lane rides along with the winning depth free,
  * pass 2 (deferred shading): color planes are only evaluated over
    the [min, max] band of chunks that actually won pixels in this
    tile — 1-3 chunks for y-coherent grasp scenes. Each chunk needs a
    single cross-lane reduction: the three 8-bit-quantized channels
    are packed into one f32 (exact parity with the reference's uint8
    OpenGL framebuffer, ``anakin/utils/renderer.py:123``) and the
    one-hot winner mask makes the lane sum the winner's value.

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
N_ROWS = 16  # packed rows per chunk (9 used, padded to the sublane tile)
_LANE_MASK = 0x7F  # low 7 mantissa bits carry the winning lane id
_PLANAR_UV = True   # uv_mode+out_ct: slice channel planes from the
                    # (4*sub_k, tile_px) blocks instead of un-interleaving
                    # to NHWC. Bit-exact; measured neutral-to-slightly-
                    # positive (-3.2/+0.6 ms across alternating rounds,
                    # script/probe_raster2.py) — kept ON because it removes
                    # a real relayout and all uv consumers read planes.
_SKIP_WPOS = False  # pass-1 hit test without the (wbits > 0) term: all
                    # inv_z are positive (rasterizer.py clamps z at 1e-6)
                    # so w = lam.iz > 0 wherever the edge test passes and
                    # the term is subsumed — EXCEPT at an exact w == +0.0
                    # cancellation, where the lane-id pack alone would
                    # fabricate a denormal hit. Measured within session
                    # noise (script/probe_raster2.py), so the guard stays.


def _pack_faces(sf, n_chunks: int, n_attr: int = 3) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ScreenFace -> two (NC, 16, LANE) plane-row arrays:
    geometry [ea0, ea1, eb0, eb1, ec0', ec1, wa, wb, wc] and attribute
    planes in edge-major order [ea·c0..c(A-1), eb·c0.., ec·c0..] (A = 3
    rgb / uvs, or 4 in uv_mode with a page-flag channel)."""
    F = sf.edge_a.shape[0]
    pad = n_chunks * LANE - F

    def _p(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))

    ea, eb, ec = _p(sf.edge_a), _p(sf.edge_b), _p(sf.edge_c)
    iz = _p(sf.inv_z)
    aoz = _p(sf.attr_over_z)  # (F', 3, 3)
    valid = _p(sf.valid)

    # fold face validity into the first edge constant: invalid faces get
    # lam0 = -BIG so the inside test rejects them with no extra mask op
    # (lam2 = 1 - lam0 - lam1 then explodes positive; lmin stays -BIG)
    ec0 = jnp.where(valid > 0, ec[:, 0], -_BIG)
    # 1/z is itself a plane in pixel coords: w = lam·iz = x(ea·iz) + ...
    # (elementwise 3-term dots — keeps these f32 on the VPU, never a
    # reduced-precision MXU contraction)
    wa = jnp.sum(ea * iz, axis=1)
    wb = jnp.sum(eb * iz, axis=1)
    wc = jnp.sum(ec * iz, axis=1)
    rows = [ea[:, 0], ea[:, 1],
            eb[:, 0], eb[:, 1],
            ec0, ec[:, 1],
            wa, wb, wc]
    rows += [jnp.zeros_like(wa)] * (N_ROWS - len(rows))
    geom = jnp.stack(rows, axis=1)  # (F', 16)

    # attribute planes: channel/z = lam·(attr/z) is linear in (x, y) too
    crows = [jnp.sum(e * aoz[:, :, ch], axis=1)
             for e in (ea, eb, ec) for ch in range(n_attr)]
    crows += [jnp.zeros_like(wa)] * (N_ROWS - len(crows))
    col = jnp.stack(crows, axis=1)  # (F', 16)

    shape = (n_chunks, LANE, N_ROWS)
    return (geom.reshape(shape).transpose(0, 2, 1),
            col.reshape(shape).transpose(0, 2, 1))


def _tile_core(x, y, geom_at, col_at, c_start, c_end, tile_px: int,
               uv_mode: bool = False):
    """Shared two-pass tile body: depth + winner id, then deferred shading.
    ``geom_at(c)``/``col_at(c)`` load chunk c's (16, LANE) plane rows.

    Gouraud mode (default): the three color channels quantize to 8 bits
    each and pack into ONE f32 so the winner-select costs one cross-lane
    reduction; returns (r8, g8, b8, depth), each (TP, 1).

    UV mode (per-pixel texturing, VERDICT r2 item 2): the interpolated
    channels are (u, v, shade, page) instead of rgb. u and v quantize to
    12 bits each (4096 texel positions — 8 bits would band visibly)
    which fills the f32 mantissa, so shade rides a SECOND 16-bit-packed
    reduction (range [0, 4] — clamping shade at 1 before the texture
    multiply would kill highlights on dark texels; GL clamps after).
    The texture-page id (constant per face, <= 255) rides the top 8 bits
    of that same pack, so the caller never needs the winning face id —
    the sorted->caller unsort gather over B*H*W pixels measured ~30 ms
    at B=128 @224^2 and is now dead code XLA eliminates when ``win`` is
    unused. Returns (uv_packed, shade_page_packed, win_face_f32, depth):
    the texture gather happens OUTSIDE the kernel in XLA (see
    renderer.sample_textures for the 128-lane-row gather formulation)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)

    # ---- pass 1: depth + winner id ----
    def chunk_body(c, carry):
        best_pf, best_chunk = carry  # (TP, 1): f32 packed, int32 chunk
        fd = geom_at(c)  # (16, LANE)
        lam0 = x * fd[0:1, :] + y * fd[2:3, :] + fd[4:5, :]
        lam1 = x * fd[1:2, :] + y * fd[3:4, :] + fd[5:6, :]
        lam2 = 1.0 - lam0 - lam1
        lmin = jnp.minimum(lam0, jnp.minimum(lam1, lam2))
        w = x * fd[6:7, :] + y * fd[7:8, :] + fd[8:9, :]
        wbits = jax.lax.bitcast_convert_type(w, jnp.int32)
        packv = (wbits & ~_LANE_MASK) | lane
        pf = jax.lax.bitcast_convert_type(packv, jnp.float32)
        hit = ((lmin >= _EPS_EDGE) if _SKIP_WPOS
               else (lmin >= _EPS_EDGE) & (wbits > 0))
        pf = jnp.where(hit, pf, 0.0)
        m = jnp.max(pf, axis=1, keepdims=True)  # (TP, 1)
        improve = m > best_pf
        best_chunk = jnp.where(improve, c, best_chunk)
        best_pf = jnp.maximum(best_pf, m)
        return best_pf, best_chunk

    init = (
        jnp.zeros((tile_px, 1), jnp.float32),
        jnp.zeros((tile_px, 1), jnp.int32),
    )
    best_pf, best_chunk = jax.lax.fori_loop(c_start, c_end, chunk_body, init)

    best_pack = jax.lax.bitcast_convert_type(best_pf, jnp.int32)
    hitm = best_pack > 0
    w_rec = jax.lax.bitcast_convert_type(best_pack & ~_LANE_MASK, jnp.float32)
    depth = jnp.where(hitm, 1.0 / jnp.maximum(w_rec, 1e-30), 0.0)  # (TP, 1)
    gidx = best_chunk * LANE + (best_pack & _LANE_MASK)

    # ---- pass 2: deferred shading over the winning-chunk band ----
    minc = jnp.min(jnp.where(hitm, best_chunk, jnp.int32(2 ** 30)))
    maxc = jnp.max(jnp.where(hitm, best_chunk, jnp.int32(-1)))
    lo = jnp.maximum(c_start, minc)
    hi = jnp.minimum(c_end, maxc + 1)

    if uv_mode:
        def uv_body(c, acc):
            fc = col_at(c)  # (16, LANE) — 4-attr stride (u, v, shade, page)
            sel = ((gidx - c * LANE) == lane).astype(jnp.float32)  # (TP, LANE)
            u = x * fc[0:1, :] + y * fc[4:5, :] + fc[8:9, :]
            v = x * fc[1:2, :] + y * fc[5:6, :] + fc[9:10, :]
            s = x * fc[2:3, :] + y * fc[6:7, :] + fc[10:11, :]
            p = x * fc[3:4, :] + y * fc[7:8, :] + fc[11:12, :]
            quv = (jnp.floor(jnp.clip(u * depth, 0.0, 1.0) * 4095.0 + 0.5) * 4096.0
                   + jnp.floor(jnp.clip(v * depth, 0.0, 1.0) * 4095.0 + 0.5))
            # page is constant per face -> the plane recovers it exactly
            # up to fp rounding; floor(+0.5) snaps it. 8 bits page + 16
            # bits shade = 24 bits, still exact in f32
            qsp = (jnp.floor(jnp.clip(p * depth, 0.0, 255.0) + 0.5) * 65536.0
                   + jnp.floor(jnp.clip(s * depth * 0.25, 0.0, 1.0) * 65535.0 + 0.5))
            return (acc[0] + jnp.sum(sel * quv, axis=1, keepdims=True),
                    acc[1] + jnp.sum(sel * qsp, axis=1, keepdims=True))

        quv, qsp = jax.lax.fori_loop(
            lo, hi, uv_body, (jnp.zeros((tile_px, 1), jnp.float32),
                              jnp.zeros((tile_px, 1), jnp.float32)))
        return quv, qsp, gidx.astype(jnp.float32), depth

    def color_body(c, acc):
        fc = col_at(c)  # (16, LANE)
        sel = ((gidx - c * LANE) == lane).astype(jnp.float32)  # (TP, LANE)
        r = x * fc[0:1, :] + y * fc[3:4, :] + fc[6:7, :]
        g = x * fc[1:2, :] + y * fc[4:5, :] + fc[7:8, :]
        bl = x * fc[2:3, :] + y * fc[5:6, :] + fc[8:9, :]
        # planes give channel/z; * depth recovers the channel, then an
        # 8-bit quantized pack makes the winner sum ONE reduction
        q = (jnp.floor(jnp.clip(r * depth, 0.0, 1.0) * 255.0 + 0.5) * 65536.0
             + jnp.floor(jnp.clip(g * depth, 0.0, 1.0) * 255.0 + 0.5) * 256.0
             + jnp.floor(jnp.clip(bl * depth, 0.0, 1.0) * 255.0 + 0.5))
        return acc + jnp.sum(sel * q, axis=1, keepdims=True)

    qsum = jax.lax.fori_loop(lo, hi, color_body,
                             jnp.zeros((tile_px, 1), jnp.float32))
    r8 = jnp.floor(qsum / 65536.0)
    g8 = jnp.floor((qsum - r8 * 65536.0) / 256.0)
    b8 = qsum - r8 * 65536.0 - g8 * 256.0
    return r8, g8, b8, depth


def _raster_kernel(ranges_ref, packed_ref, colors_ref, out_ref, *, width: int,
                   tile_px: int, n_tiles: int, sub_k: int,
                   uv_mode: bool = False, out_ct: bool = False):
    """One grid step rasterizes ``sub_k`` consecutive tiles (statically
    unrolled): the fixed per-grid-step cost (~12 us measured — Mosaic
    step machinery + output DMA turnaround) dominates the raster at
    realistic face counts, so amortizing it over k tiles is the lever —
    each sub-tile keeps its OWN tight chunk range from the prefetch
    table, unlike simply growing tile_px (which loosens y-culling).

    ``out_ct`` (channel-transposed output): the natural (TP, 4) output
    block puts only 4 of 128 lanes to work, so its block->HBM DMA is
    TP rows x 16 bytes — thousands of descriptor-sized transfers per
    grid step. With out_ct the block is (4 * sub_k, tile_px): channels
    land on sublanes (subtile j writes rows [4j, 4j+4)), pixels fill
    whole 128-lane rows, and the DMA is one dense lane-aligned block.
    Costs one (TP, 4) -> (4, TP) in-kernel relayout per subtile."""
    b = pl.program_id(0)
    s = pl.program_id(1)
    for j in range(sub_k):
        t = s * sub_k + j
        base = t * tile_px
        pix = base + jax.lax.broadcasted_iota(jnp.int32, (tile_px, 1), 0)
        x = (pix % width).astype(jnp.float32) + 0.5  # (TP, 1)
        y = (pix // width).astype(jnp.float32) + 0.5

        # ranges is flat (B * n_super * sub_k * 2,): SMEM pads trailing
        # dims to the lane width, so a (B, T, 2) layout would blow the
        # 1MB SMEM budget
        rbase = (b * n_tiles + t) * 2
        c0, c1, c2, depth = _tile_core(
            x, y, lambda c: packed_ref[0, c], lambda c: colors_ref[0, c],
            ranges_ref[rbase], ranges_ref[rbase + 1], tile_px,
            uv_mode=uv_mode)

        if not uv_mode:
            c0 = c0 * (1.0 / 255.0)
            c1 = c1 * (1.0 / 255.0)
            c2 = c2 * (1.0 / 255.0)
        if out_ct:
            cat = jnp.concatenate([c0, c1, c2, depth], axis=1)  # (TP, 4)
            out_ref[0, 0, 4 * j:4 * (j + 1), :] = jnp.transpose(cat)
        else:
            lo = j * tile_px
            out_ref[0, 0, lo:lo + tile_px, 0:1] = c0
            out_ref[0, 0, lo:lo + tile_px, 1:2] = c1
            out_ref[0, 0, lo:lo + tile_px, 2:3] = c2
            out_ref[0, 0, lo:lo + tile_px, 3:4] = depth


def _raster_kernel_binned(ranges_ref, packed_ref, colors_ref, out_ref, *,
                          tw: int, th: int, n_xbins: int, n_ytiles: int):
    """2D-binned variant: tiles are (th x tw) pixel blocks; grid axis 1 is
    the x-bin so each tile only loops over ITS column's face chunks."""
    b = pl.program_id(0)
    tx = pl.program_id(1)
    ty = pl.program_id(2)
    tp = th * tw
    pix = jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)
    x = (tx * tw + pix % tw).astype(jnp.float32) + 0.5  # (TP, 1)
    y = (ty * th + pix // tw).astype(jnp.float32) + 0.5

    rbase = ((b * n_xbins + tx) * n_ytiles + ty) * 2
    r8, g8, b8, depth = _tile_core(
        x, y, lambda c: packed_ref[0, 0, c], lambda c: colors_ref[0, 0, c],
        ranges_ref[rbase], ranges_ref[rbase + 1], tp)

    out_ref[0, 0, 0, :, 0:1] = r8 * (1.0 / 255.0)
    out_ref[0, 0, 0, :, 1:2] = g8 * (1.0 / 255.0)
    out_ref[0, 0, 0, :, 2:3] = b8 * (1.0 / 255.0)
    out_ref[0, 0, 0, :, 3:4] = depth


@partial(jax.jit, static_argnames=("height", "width", "tile_px",
                                   "cull_backfaces", "xbin_w", "tile_rows",
                                   "sub_k", "uv_mode", "out_ct"))
def rasterize_batch_pallas(
    verts_screen: jnp.ndarray,  # (B, V, 3)
    vert_attrs: jnp.ndarray,    # (B, V, 3) rgb
    faces: jnp.ndarray,         # (F, 3) shared topology
    face_valid: Optional[jnp.ndarray],  # (B, F) or None
    height: int,
    width: int,
    tile_px: Optional[int] = None,
    cull_backfaces: bool = False,
    xbin_w: Optional[int] = None,
    tile_rows: int = 8,
    sub_k: Optional[int] = None,
    uv_mode: bool = False,
    out_ct: Optional[bool] = None,
) -> Tuple[jnp.ndarray, ...]:
    """-> (rgb (B, H, W, 3), depth (B, H, W)). depth 0 = background.

    ``uv_mode``: vert_attrs are (u, v, shade, page) instead of rgb;
    returns (uv_packed (B, H, W) — u12*4096+v12, shade (B, H, W) in
    [0, 4], page (B, H, W) int32 texture-page id, win_face (B, H, W)
    int32, depth). The caller gathers texels in XLA (see
    renderer.sample_textures); win_face costs a B*H*W unsort gather and
    is DCE'd by XLA when unused. Not supported on the binned path.

    ``xbin_w``: enable 2D x-binning — faces are duplicated into
    ``ceil(width / xbin_w)`` x-bands (per-band validity + per-band y-sort)
    and tiles become (tile_rows x xbin_w) pixel blocks, so a tile only
    evaluates the face chunks of its own column. Pays when faces are
    small relative to the frame (real mesh renders); the default 1D
    y-culled path is kept for xbin_w=None (or when only one bin fits)."""
    B, V, _ = verts_screen.shape
    F = faces.shape[-2]
    n_attr = vert_attrs.shape[-1]
    assert n_attr == (4 if uv_mode else 3), (
        "expects rgb attrs (3) or uv_mode (u, v, shade, page) attrs (4)")
    n_chunks = (F + LANE - 1) // LANE

    if face_valid is None:
        face_valid = jnp.ones((B, F), jnp.float32)

    faces_axis = 0 if faces.ndim == 3 else None  # per-sample topology OK
    sf = jax.vmap(
        partial(build_screen_faces, cull_backfaces=cull_backfaces),
        in_axes=(0, 0, faces_axis, 0),
    )(verts_screen, vert_attrs, faces, face_valid)

    if xbin_w is not None and width > xbin_w:
        assert not uv_mode, "uv_mode is not supported on the binned path"
        return _rasterize_binned(sf, B, F, n_chunks, height, width,
                                 xbin_w, tile_rows)

    if tile_px is None:
        # measured sweet spots: 512 wins on real grasp scenes at 224px
        # (95.1 ms vs 97.4 @1024, B=128 composed hand+object) and within
        # 1.6% of 1024 on the random worst case; at >=512px a single-row
        # 512 tile's tighter y-culling also wins (116 ms vs 121 @1024)
        tile_px = 512
    if sub_k is None:
        sub_k = 1
    n_pix = height * width
    n_tiles = (n_pix + tile_px - 1) // tile_px
    n_super = (n_tiles + sub_k - 1) // sub_k
    n_tiles = n_super * sub_k  # pad: extra tiles get empty chunk ranges

    # sort faces by screen-y so each 128-face chunk is y-coherent
    ymin_key = jnp.where(sf.valid > 0, sf.bbox[..., 1], _BIG)  # (B, F)
    order = jnp.argsort(ymin_key, axis=1)
    sf = jax.tree_util.tree_map(
        lambda a: jnp.take_along_axis(
            a, order.reshape(order.shape + (1,) * (a.ndim - 2)), axis=1
        ),
        sf,
    )
    packed, colors = jax.vmap(
        lambda s: _pack_faces(s, n_chunks, n_attr=n_attr))(sf)

    # per-(batch, tile) chunk ranges from the sorted chunk y-extents
    padF = n_chunks * LANE - F
    fymin = jnp.pad(jnp.where(sf.valid > 0, sf.bbox[..., 1], _BIG),
                    ((0, 0), (0, padF)), constant_values=_BIG)
    fymax = jnp.pad(jnp.where(sf.valid > 0, sf.bbox[..., 3], -_BIG),
                    ((0, 0), (0, padF)), constant_values=-_BIG)
    chunk_ymin = jnp.min(fymin.reshape(B, n_chunks, LANE), axis=-1)  # (B, NC)
    chunk_ymax = jnp.max(fymax.reshape(B, n_chunks, LANE), axis=-1)  # (B, NC)
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

    if out_ct is None:
        out_ct = tile_px % LANE == 0
    elif out_ct and tile_px % LANE != 0:
        # an explicit request for the channel-transposed layout cannot be
        # honored (lanes must stay aligned) — say so instead of silently
        # timing the other layout (ADVICE r3)
        from artiboost_tpu.utils.logger import logger

        logger.warning(
            f"out_ct=True requires tile_px % {LANE} == 0 (got {tile_px}); "
            "falling back to the (sub_k*tile_px, 4) output layout")
        out_ct = False
    out_block = ((1, 1, 4 * sub_k, tile_px) if out_ct
                 else (1, 1, sub_k * tile_px, 4))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_super),
        in_specs=[
            pl.BlockSpec((1, n_chunks, N_ROWS, LANE), lambda b, t, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_chunks, N_ROWS, LANE), lambda b, t, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(out_block, lambda b, t, *_: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        partial(_raster_kernel, width=width, tile_px=tile_px, n_tiles=n_tiles,
                sub_k=sub_k, uv_mode=uv_mode, out_ct=out_ct),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_super) + out_block[2:],
                                       jnp.float32),
        interpret=jax.default_backend() == "cpu",  # tests run on CPU mesh
    )(ranges, packed, colors)

    if uv_mode and out_ct and _PLANAR_UV:
        # planar extraction: every uv consumer reads the channels as
        # separate (B, H, W) planes (sample_textures, compositing), so
        # un-interleaving to NHWC is pure relayout cost. Slice each
        # channel's sublane rows out of the (4*sub_k, tile_px) blocks
        # instead (A/B vs the transpose: script/probe_raster2.py).
        o = out.reshape(B, n_super, sub_k, 4, tile_px)

        def plane(ch):
            p = o[:, :, :, ch, :].reshape(B, n_tiles * tile_px)[:, :n_pix]
            return p.reshape(B, height, width)

        quv, qsp, winf, depth = (plane(c) for c in range(4))
        win_sorted = jnp.clip(winf.astype(jnp.int32), 0, F - 1)
        win = jnp.take_along_axis(
            order, win_sorted.reshape(B, -1), axis=1).reshape(win_sorted.shape)
        page = jnp.floor(qsp * (1.0 / 65536.0))
        shade = (qsp - page * 65536.0) * (4.0 / 65535.0)
        return quv, shade, page.astype(jnp.int32), win, depth
    if out_ct:
        # sublane s = 4j + ch: un-interleave channels back to minor dim
        out = out.reshape(B, n_super, sub_k, 4, tile_px).transpose(0, 1, 2, 4, 3)
    flat = out.reshape(B, n_tiles * tile_px, 4)[:, :n_pix]
    img = flat.reshape(B, height, width, 4)
    if uv_mode:
        # win_face is an index into the Y-SORTED face order; map it back
        # to the caller's face ids through the sort permutation (unused
        # by the production texture path — page rides the kernel pack —
        # so XLA dead-code-eliminates this gather there)
        win_sorted = jnp.clip(img[..., 2].astype(jnp.int32), 0, F - 1)
        win = jnp.take_along_axis(
            order, win_sorted.reshape(B, -1), axis=1).reshape(win_sorted.shape)
        qsp = img[..., 1]
        page = jnp.floor(qsp * (1.0 / 65536.0))
        shade = (qsp - page * 65536.0) * (4.0 / 65535.0)
        return img[..., 0], shade, page.astype(jnp.int32), win, img[..., 3]
    return img[..., :3], img[..., 3]


def _rasterize_binned(sf, B: int, F: int, n_chunks: int, height: int,
                      width: int, xbin_w: int, tile_rows: int):
    """2D-binned rasterization: per-x-band face lists (duplication is
    implicit — every face exists in every band, invalid copies y-sort to
    the end and never enter the chunk ranges)."""
    NB = (width + xbin_w - 1) // xbin_w
    TH, TW = tile_rows, xbin_w
    YT = (height + TH - 1) // TH
    TP = TH * TW

    # per-band validity: face bbox overlaps [b*TW, (b+1)*TW)
    xlo = jnp.arange(NB, dtype=jnp.float32)[None, :, None] * TW  # (1, NB, 1)
    vb = ((sf.valid[:, None, :] > 0)
          & (sf.bbox[:, None, :, 2] >= xlo)
          & (sf.bbox[:, None, :, 0] < xlo + TW)).astype(jnp.float32)

    # per-band y-sort (invalid copies sink to the end)
    ymin_key = jnp.where(vb > 0, sf.bbox[:, None, :, 1], _BIG)  # (B, NB, F)
    order = jnp.argsort(ymin_key, axis=-1)

    def _gather(a):  # (B, F, ...) -> (B, NB, F, ...) banded + sorted
        ab = jnp.broadcast_to(a[:, None], (B, NB) + a.shape[1:])
        idx = order.reshape(order.shape + (1,) * (a.ndim - 2))
        return jnp.take_along_axis(ab, idx, axis=2)

    sfb = jax.tree_util.tree_map(_gather, sf)
    vb_sorted = jnp.take_along_axis(vb, order, axis=-1)
    sfb = sfb._replace(valid=vb_sorted)
    packed, colors = jax.vmap(jax.vmap(lambda s: _pack_faces(s, n_chunks)))(sfb)
    # (B, NB, NC, 16, LANE) x2

    # per-(batch, band, y-tile) chunk ranges from sorted chunk y-extents
    padF = n_chunks * LANE - F
    fymin = jnp.pad(jnp.where(vb_sorted > 0, sfb.bbox[..., 1], _BIG),
                    ((0, 0), (0, 0), (0, padF)), constant_values=_BIG)
    fymax = jnp.pad(jnp.where(vb_sorted > 0, sfb.bbox[..., 3], -_BIG),
                    ((0, 0), (0, 0), (0, padF)), constant_values=-_BIG)
    chunk_ymin = jnp.min(fymin.reshape(B, NB, n_chunks, LANE), -1)  # (B,NB,NC)
    chunk_ymax = jnp.max(fymax.reshape(B, NB, n_chunks, LANE), -1)
    ty = jnp.arange(YT, dtype=jnp.float32)
    tile_ymin = ty * TH           # (YT,)
    tile_ymax = (ty + 1) * TH     # exclusive; pixel centers at +0.5 < this
    cummax_ymax = jax.lax.cummax(chunk_ymax, axis=2)  # (B, NB, NC)
    ends = jnp.sum(chunk_ymin[:, :, None, :] <= tile_ymax[None, None, :, None],
                   axis=-1)
    starts = jnp.sum(cummax_ymax[:, :, None, :] < tile_ymin[None, None, :, None],
                     axis=-1)
    ranges = jnp.stack([jnp.minimum(starts, ends), ends],
                       axis=-1).astype(jnp.int32).reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, NB, YT),
        in_specs=[
            pl.BlockSpec((1, 1, n_chunks, N_ROWS, LANE),
                         lambda b, tx, ty, *_: (b, tx, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_chunks, N_ROWS, LANE),
                         lambda b, tx, ty, *_: (b, tx, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, TP, 4),
                               lambda b, tx, ty, *_: (b, tx, ty, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        partial(_raster_kernel_binned, tw=TW, th=TH, n_xbins=NB, n_ytiles=YT),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, NB, YT, TP, 4), jnp.float32),
        interpret=jax.default_backend() == "cpu",  # tests run on CPU mesh
    )(ranges, packed, colors)

    # (B, NB, YT, TH, TW, 4) -> (B, YT*TH, NB*TW, 4) -> crop
    img = out.reshape(B, NB, YT, TH, TW, 4).transpose(0, 2, 3, 1, 4, 5)
    img = img.reshape(B, YT * TH, NB * TW, 4)[:, :height, :width]
    return img[..., :3], img[..., 3]
