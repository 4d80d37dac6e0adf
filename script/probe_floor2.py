#!/usr/bin/env python
"""Follow-up to probe_floor.py: decompose the ~96 ms overhead that
survives even with empty chunk ranges (novalid) and no loops (noloop).

  nowin        - production outputs minus the win unsort gather (mimics
                 what XLA DCEs in the real synth pipeline)
  nowin_noloop - same, with the no-op tile core: prep + pallas + post
  prep_only    - build_screen_faces + y-sort + pack + ranges, no kernel
  kernel_only  - pallas_call alone on PREBUILT (ranges, packed, colors)
  post_only    - the out_ct un-interleave + crop + uv decode on a
                 prebuilt kernel-output tensor

Captured inputs are cached in /tmp/raster_inputs.npz by probe_floor.py
(re-captured here if absent). Run from the repo root.
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import artiboost_tpu.ops.rasterizer_pallas as RP
from artiboost_tpu.ops.rasterizer import build_screen_faces

DISPATCH_FLOOR = 0.028
REPS = 6
CACHE = "/tmp/raster_inputs.npz"

STATIC = ("height", "width", "tile_px", "cull_backfaces", "xbin_w",
          "tile_rows", "sub_k", "uv_mode", "out_ct")


def get_inputs():
    if not os.path.exists(CACHE):
        from probe_floor import capture_inputs
        box = capture_inputs()
        np.savez(CACHE, vs=box["vs"], attrs=box["attrs"], faces=box["faces"],
                 fv=box["fv"], height=box["height"], width=box["width"])
    z = np.load(CACHE)
    return z


def timed(fn, args_list):
    out = fn(*args_list[0])
    out0 = out[0] if isinstance(out, (tuple, list)) else out
    float(jnp.ravel(out0)[0])
    t0 = time.time()
    for a in args_list[1:]:
        out = fn(*a)
        out0 = out[0] if isinstance(out, (tuple, list)) else out
        float(jnp.ravel(out0)[0])
    return (time.time() - t0) / (len(args_list) - 1) - DISPATCH_FLOOR


def main():
    print("devices:", jax.devices(), flush=True)
    z = get_inputs()
    dev = jax.devices()[0]
    vs = jax.device_put(jnp.asarray(z["vs"]), dev)
    attrs = jax.device_put(jnp.asarray(z["attrs"]), dev)
    faces = jax.device_put(jnp.asarray(z["faces"]), dev)
    fv = jax.device_put(jnp.asarray(z["fv"]), dev)
    height, width = int(z["height"]), int(z["width"])
    kw = dict(cull_backfaces=True, tile_px=512, sub_k=8, uv_mode=True)
    B, F = vs.shape[0], faces.shape[-2]
    n_chunks = (F + RP.LANE - 1) // RP.LANE

    raw = RP.rasterize_batch_pallas.__wrapped__
    deltas = [jnp.full(vs.shape, 1e-4 * (r + 1), vs.dtype)
              for r in range(REPS + 1)]
    for d in deltas:
        float(jnp.ravel(d)[0])
    vs_args = [(vs + d,) for d in deltas]

    def report(name, t):
        print(json.dumps({"variant": name, "ms": round(t * 1e3, 2)}),
              flush=True)

    # --- nowin: full production path, win gather dead ---
    @jax.jit
    def f_nowin(v):
        quv, sh, pg, _win, depth = raw(v, attrs, faces, fv, height, width,
                                       **kw)
        return quv, sh, pg, depth

    report("nowin", timed(f_nowin, vs_args))

    # --- nowin variants with patched tile cores / sub_k ---
    from probe_floor import (tile_core_noloop, tile_core_pass1_only,
                             tile_core_ewmax)
    orig_core = RP._tile_core

    def run_core(name, core, **kwo):
        RP._tile_core = core
        try:
            k = dict(kw)
            k.update(kwo)

            @jax.jit
            def f(v):
                quv, sh, pg, _win, depth = raw(v, attrs, faces, fv, height,
                                               width, **k)
                return quv, sh, pg, depth

            report(name, timed(f, vs_args))
        finally:
            RP._tile_core = orig_core

    run_core("nowin_noloop", tile_core_noloop)
    run_core("nowin_pass1", tile_core_pass1_only)
    run_core("nowin_ewmax", tile_core_ewmax)
    run_core("nowin_subk14", orig_core, sub_k=14)
    run_core("nowin_rep2", orig_core)

    # --- prep_only: everything up to the pallas_call inputs ---
    n_pix = height * width
    tile_px, sub_k = kw["tile_px"], kw["sub_k"]
    n_tiles = (n_pix + tile_px - 1) // tile_px
    n_super = (n_tiles + sub_k - 1) // sub_k
    n_tiles_p = n_super * sub_k

    def build_prep(v):
        sf = jax.vmap(partial(build_screen_faces, cull_backfaces=True),
                      in_axes=(0, 0, 0, 0))(v, attrs, faces, fv)
        ymin_key = jnp.where(sf.valid > 0, sf.bbox[..., 1], RP._BIG)
        order = jnp.argsort(ymin_key, axis=1)
        sf = jax.tree_util.tree_map(
            lambda a: jnp.take_along_axis(
                a, order.reshape(order.shape + (1,) * (a.ndim - 2)), axis=1),
            sf)
        packed, colors = jax.vmap(
            lambda s: RP._pack_faces(s, n_chunks, n_attr=4))(sf)
        padF = n_chunks * RP.LANE - F
        fymin = jnp.pad(jnp.where(sf.valid > 0, sf.bbox[..., 1], RP._BIG),
                        ((0, 0), (0, padF)), constant_values=RP._BIG)
        fymax = jnp.pad(jnp.where(sf.valid > 0, sf.bbox[..., 3], -RP._BIG),
                        ((0, 0), (0, padF)), constant_values=-RP._BIG)
        chunk_ymin = jnp.min(fymin.reshape(B, n_chunks, RP.LANE), axis=-1)
        chunk_ymax = jnp.max(fymax.reshape(B, n_chunks, RP.LANE), axis=-1)
        tile_idx = jnp.arange(n_tiles_p)
        tile_ymin = ((tile_idx * tile_px) // width).astype(jnp.float32)
        tile_ymax = (((tile_idx + 1) * tile_px - 1) // width).astype(
            jnp.float32) + 1.0
        cummax = jax.lax.cummax(chunk_ymax, axis=1)
        ends = jnp.sum(chunk_ymin[:, None, :] <= tile_ymax[None, :, None], -1)
        starts = jnp.sum(cummax[:, None, :] < tile_ymin[None, :, None], -1)
        ranges = jnp.stack([jnp.minimum(starts, ends), ends],
                           axis=-1).astype(jnp.int32).reshape(-1)
        return ranges, packed, colors

    @jax.jit
    def f_prep(v):
        ranges, packed, colors = build_prep(v)
        return (jnp.sum(packed) + jnp.sum(colors)
                + jnp.sum(ranges.astype(jnp.float32)))

    report("prep_only", timed(f_prep, vs_args))

    # --- kernel_only: pallas_call on prebuilt inputs ---
    ranges_c, packed_c, colors_c = jax.jit(build_prep)(vs)
    ranges_c = jax.device_put(ranges_c, dev)
    packed_c = jax.device_put(packed_c, dev)
    colors_c = jax.device_put(colors_c, dev)
    out_block = (1, 1, 4 * sub_k, tile_px)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel_call(ranges, packed, colors):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_super),
            in_specs=[
                pl.BlockSpec((1, n_chunks, RP.N_ROWS, RP.LANE),
                             lambda b, t, *_: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_chunks, RP.N_ROWS, RP.LANE),
                             lambda b, t, *_: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(out_block, lambda b, t, *_: (b, t, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            partial(RP._raster_kernel, width=width, tile_px=tile_px,
                    n_tiles=n_tiles_p, sub_k=sub_k, uv_mode=True,
                    out_ct=True),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, n_super) + out_block[2:],
                                           jnp.float32),
        )(ranges, packed, colors)

    @jax.jit
    def f_kernel(packed, r):
        out = kernel_call(ranges_c, packed + r * 0.0, colors_c)
        return out

    p_args = [(packed_c, jnp.float32(r) * 1e-6) for r in range(REPS + 1)]
    report("kernel_only", timed(f_kernel, p_args))

    # --- post_only: un-interleave + crop + decode on a prebuilt output ---
    out_c = jax.jit(f_kernel)(packed_c, jnp.float32(0.0))
    out_c = jax.device_put(out_c, dev)

    @jax.jit
    def f_post(out, r):
        out = out + r
        o = out.reshape(B, n_super, sub_k, 4, tile_px).transpose(0, 1, 2, 4, 3)
        flat = o.reshape(B, n_tiles_p * tile_px, 4)[:, :n_pix]
        img = flat.reshape(B, height, width, 4)
        qsp = img[..., 1]
        page = jnp.floor(qsp * (1.0 / 65536.0))
        shade = (qsp - page * 65536.0) * (4.0 / 65535.0)
        return img[..., 0], shade, page.astype(jnp.int32), img[..., 3]

    o_args = [(out_c, jnp.float32(r) * 1e-6) for r in range(REPS + 1)]
    report("post_only", timed(f_post, o_args))

    # --- win_gather alone: the unsort take_along_axis ---
    win_c = jnp.clip(out_c[..., :1, :].reshape(B, -1)[:, :n_pix].astype(
        jnp.int32), 0, F - 1)
    order_c = jnp.argsort(jnp.ones((B, F)), axis=1).astype(jnp.int32)

    @jax.jit
    def f_win(w, r):
        return jnp.take_along_axis(order_c, (w + r) % F, axis=1)

    w_args = [(win_c, jnp.int32(r)) for r in range(REPS + 1)]
    report("win_gather", timed(f_win, w_args))


if __name__ == "__main__":
    main()
