#!/usr/bin/env python
"""On-chip decomposition of the rasterizer's ~41 ms at the production
config (LOD-128, uv_mode, tile 512 / sub_k 8 / out_ct, B=128 @224^2):

  full        - production kernel, isolated from the rest of synth
  pass1_only  - _tile_core patched to skip pass 2 (depth/winner only)
  noloop      - _tile_core patched to skip BOTH chunk loops: measures
                XLA prep (pack/sort/ranges) + grid-step machinery + DMA
  novalid     - all faces invalid -> every tile's chunk range is empty
                (same as noloop but through the real control flow)
  subk14      - sub_k 14 (98 tiles -> 7 grid steps/batch vs 13): step-
                count sensitivity at the LOD-128 face count
  ewmax       - pass-1 prototype: carry the running depth-max as a full
                (TP, LANE) elementwise max (chunk id rides the low 7
                mantissa bits instead of the lane id; the lane is
                recovered by ONE argmax after the loop) so the per-chunk
                cross-lane reduction + (TP, 1) bookkeeping disappear

Inputs are captured from the real synth pipeline (CPU eager run of the
pre-raster stages) so screen-space face distribution and chunk ranges
are the production ones. ewmax is also parity-checked against full.

Run from the repo root. Tunnel rules: vary inputs per rep, fetch a
scalar per rep, subtract the 28 ms dispatch floor (CLAUDE.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import artiboost_tpu.ops.rasterizer_pallas as RP
import artiboost_tpu.artiboost.renderer as R
from artiboost_tpu.artiboost.loader import ArtiBoostLoader
from artiboost_tpu.utils.config import load_config

DISPATCH_FLOOR = 0.028
B = 128
REPS = 6

STATIC = ("height", "width", "tile_px", "cull_backfaces", "xbin_w",
          "tile_rows", "sub_k", "uv_mode", "out_ct")


class _Captured(Exception):
    pass


def capture_inputs():
    """Run the pre-raster synth stages eagerly on CPU; grab the real
    rasterize_batch_pallas argument arrays."""
    cfg = load_config("config/ho3dv2_clasbased_artiboost.yaml")
    manager_cfg = dict(cfg["MANAGER"])
    manager_cfg["DATA_PRESET"] = cfg.get("DATA_PRESET", {})
    manager_cfg["CONFIG_LEN_TRAIN"] = 256
    manager_cfg["OPG_BATCH_SIZE"] = 256
    loader = ArtiBoostLoader(real_dataset=None, cfg=manager_cfg,
                             batch_size=B, seed=0)
    loader.prepare()

    box = {}
    orig = R.rasterize_batch_pallas

    def grab(vs, attrs, faces, face_valid, height, width, **kw):
        box.update(vs=np.asarray(vs), attrs=np.asarray(attrs),
                   faces=np.asarray(faces), fv=np.asarray(face_valid),
                   height=height, width=width, kw=kw)
        raise _Captured

    R.rasterize_batch_pallas = grab
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            key = jax.random.PRNGKey(1)
            idx = jnp.arange(B, dtype=jnp.int32)
            try:
                loader.synth_batch_fn(key, loader.generated, idx)
            except _Captured:
                pass
    finally:
        R.rasterize_batch_pallas = orig
    assert box, "rasterize_batch_pallas was never reached"
    np.savez("/tmp/raster_inputs.npz", vs=box["vs"], attrs=box["attrs"],
             faces=box["faces"], fv=box["fv"], height=box["height"],
             width=box["width"])
    return box


def tile_core_pass1_only(x, y, geom_at, col_at, c_start, c_end, tile_px,
                         uv_mode=False):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, RP.LANE), 1)

    def chunk_body(c, carry):
        best_pf, best_chunk = carry
        fd = geom_at(c)
        lam0 = x * fd[0:1, :] + y * fd[2:3, :] + fd[4:5, :]
        lam1 = x * fd[1:2, :] + y * fd[3:4, :] + fd[5:6, :]
        lam2 = 1.0 - lam0 - lam1
        lmin = jnp.minimum(lam0, jnp.minimum(lam1, lam2))
        w = x * fd[6:7, :] + y * fd[7:8, :] + fd[8:9, :]
        wbits = jax.lax.bitcast_convert_type(w, jnp.int32)
        packv = (wbits & ~RP._LANE_MASK) | lane
        pf = jax.lax.bitcast_convert_type(packv, jnp.float32)
        hit = (lmin >= RP._EPS_EDGE) & (wbits > 0)
        pf = jnp.where(hit, pf, 0.0)
        m = jnp.max(pf, axis=1, keepdims=True)
        improve = m > best_pf
        best_chunk = jnp.where(improve, c, best_chunk)
        best_pf = jnp.maximum(best_pf, m)
        return best_pf, best_chunk

    init = (jnp.zeros((tile_px, 1), jnp.float32),
            jnp.zeros((tile_px, 1), jnp.int32))
    best_pf, best_chunk = jax.lax.fori_loop(c_start, c_end, chunk_body, init)
    best_pack = jax.lax.bitcast_convert_type(best_pf, jnp.int32)
    hitm = best_pack > 0
    w_rec = jax.lax.bitcast_convert_type(best_pack & ~RP._LANE_MASK,
                                         jnp.float32)
    depth = jnp.where(hitm, 1.0 / jnp.maximum(w_rec, 1e-30), 0.0)
    gidx = best_chunk * RP.LANE + (best_pack & RP._LANE_MASK)
    gf = gidx.astype(jnp.float32)
    if uv_mode:
        return gf, gf, gf, depth
    return gf, gf, gf, depth


def tile_core_noloop(x, y, geom_at, col_at, c_start, c_end, tile_px,
                     uv_mode=False):
    # touch one element of each operand block so the input DMA stays
    c = x * 0.0 + geom_at(0)[0:1, 0:1] + col_at(0)[0:1, 0:1] \
        + c_start.astype(jnp.float32) + c_end.astype(jnp.float32)
    return c, c, c, c


def tile_core_ewmax(x, y, geom_at, col_at, c_start, c_end, tile_px,
                    uv_mode=False):
    """Pass-1 with a full-width carry: per-lane running max of
    (depth-bits | chunk-id); ONE cross-lane max + argmax after the loop."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, RP.LANE), 1)

    def chunk_body(c, best):
        fd = geom_at(c)
        lam0 = x * fd[0:1, :] + y * fd[2:3, :] + fd[4:5, :]
        lam1 = x * fd[1:2, :] + y * fd[3:4, :] + fd[5:6, :]
        lam2 = 1.0 - lam0 - lam1
        lmin = jnp.minimum(lam0, jnp.minimum(lam1, lam2))
        w = x * fd[6:7, :] + y * fd[7:8, :] + fd[8:9, :]
        wbits = jax.lax.bitcast_convert_type(w, jnp.int32)
        packv = (wbits & ~RP._LANE_MASK) | c
        pf = jax.lax.bitcast_convert_type(packv, jnp.float32)
        hit = (lmin >= RP._EPS_EDGE) & (wbits > 0)
        pf = jnp.where(hit, pf, 0.0)
        return jnp.maximum(best, pf)

    best = jax.lax.fori_loop(
        c_start, c_end, chunk_body,
        jnp.zeros((tile_px, RP.LANE), jnp.float32))

    best_pf = jnp.max(best, axis=1, keepdims=True)       # (TP, 1)
    # winning lane: highest lane holding the max (deterministic)
    lane_full = jax.lax.broadcasted_iota(jnp.int32, (tile_px, RP.LANE), 1)
    win_lane = jnp.max(jnp.where(best == best_pf, lane_full, -1),
                       axis=1, keepdims=True)
    best_pack = jax.lax.bitcast_convert_type(best_pf, jnp.int32)
    hitm = best_pack > 0
    best_chunk = jnp.where(hitm, best_pack & RP._LANE_MASK, 0)
    w_rec = jax.lax.bitcast_convert_type(best_pack & ~RP._LANE_MASK,
                                         jnp.float32)
    depth = jnp.where(hitm, 1.0 / jnp.maximum(w_rec, 1e-30), 0.0)
    gidx = best_chunk * RP.LANE + jnp.maximum(win_lane, 0)

    # ---- pass 2 (unchanged from _tile_core) ----
    minc = jnp.min(jnp.where(hitm, best_chunk, jnp.int32(2 ** 30)))
    maxc = jnp.max(jnp.where(hitm, best_chunk, jnp.int32(-1)))
    lo = jnp.maximum(c_start, minc)
    hi = jnp.minimum(c_end, maxc + 1)

    if uv_mode:
        def uv_body(c, acc):
            fc = col_at(c)
            sel = ((gidx - c * RP.LANE) == lane).astype(jnp.float32)
            u = x * fc[0:1, :] + y * fc[4:5, :] + fc[8:9, :]
            v = x * fc[1:2, :] + y * fc[5:6, :] + fc[9:10, :]
            s = x * fc[2:3, :] + y * fc[6:7, :] + fc[10:11, :]
            p = x * fc[3:4, :] + y * fc[7:8, :] + fc[11:12, :]
            quv = (jnp.floor(jnp.clip(u * depth, 0.0, 1.0) * 4095.0 + 0.5)
                   * 4096.0
                   + jnp.floor(jnp.clip(v * depth, 0.0, 1.0) * 4095.0 + 0.5))
            qsp = (jnp.floor(jnp.clip(p * depth, 0.0, 255.0) + 0.5) * 65536.0
                   + jnp.floor(jnp.clip(s * depth * 0.25, 0.0, 1.0)
                               * 65535.0 + 0.5))
            return (acc[0] + jnp.sum(sel * quv, axis=1, keepdims=True),
                    acc[1] + jnp.sum(sel * qsp, axis=1, keepdims=True))

        quv, qsp = jax.lax.fori_loop(
            lo, hi, uv_body, (jnp.zeros((tile_px, 1), jnp.float32),
                              jnp.zeros((tile_px, 1), jnp.float32)))
        return quv, qsp, gidx.astype(jnp.float32), depth

    def color_body(c, acc):
        fc = col_at(c)
        sel = ((gidx - c * RP.LANE) == lane).astype(jnp.float32)
        r = x * fc[0:1, :] + y * fc[3:4, :] + fc[6:7, :]
        g = x * fc[1:2, :] + y * fc[4:5, :] + fc[7:8, :]
        bl = x * fc[2:3, :] + y * fc[5:6, :] + fc[8:9, :]
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


def timed_raster(fn, vs, attrs, faces, fv, height, width, reps=REPS, **kw):
    outs = fn(vs, attrs, faces, fv, height, width, **kw)
    float(jnp.ravel(outs[0])[0])
    deltas = [jnp.full(vs.shape, 1e-4 * (r + 1), vs.dtype) for r in range(reps)]
    for d in deltas:
        float(jnp.ravel(d)[0])
    t0 = time.time()
    for d in deltas:
        outs = fn(vs + d, attrs, faces, fv, height, width, **kw)
        float(jnp.ravel(outs[0])[0])
    return (time.time() - t0) / reps - DISPATCH_FLOOR


def chunk_stats(vs, attrs, faces, fv, height, width, tile_px, sub_k):
    """Host recompute of the kernel's chunk ranges -> live-chunk stats."""
    from functools import partial
    from artiboost_tpu.ops.rasterizer import build_screen_faces
    F = faces.shape[-2]
    n_chunks = (F + RP.LANE - 1) // RP.LANE
    faces_axis = 0 if faces.ndim == 3 else None
    sf = jax.vmap(partial(build_screen_faces, cull_backfaces=True),
                  in_axes=(0, 0, faces_axis, 0))(vs, attrs, faces, fv)
    ymin_key = jnp.where(sf.valid > 0, sf.bbox[..., 1], RP._BIG)
    order = jnp.argsort(ymin_key, axis=1)
    bbox = jnp.take_along_axis(sf.bbox, order[..., None], axis=1)
    valid = jnp.take_along_axis(sf.valid, order, axis=1)
    n_pix = height * width
    n_tiles = (n_pix + tile_px - 1) // tile_px
    n_super = (n_tiles + sub_k - 1) // sub_k
    n_tiles = n_super * sub_k
    padF = n_chunks * RP.LANE - F
    fymin = jnp.pad(jnp.where(valid > 0, bbox[..., 1], RP._BIG),
                    ((0, 0), (0, padF)), constant_values=RP._BIG)
    fymax = jnp.pad(jnp.where(valid > 0, bbox[..., 3], -RP._BIG),
                    ((0, 0), (0, padF)), constant_values=-RP._BIG)
    Bn = vs.shape[0]
    chunk_ymin = jnp.min(fymin.reshape(Bn, n_chunks, RP.LANE), axis=-1)
    chunk_ymax = jnp.max(fymax.reshape(Bn, n_chunks, RP.LANE), axis=-1)
    tile_idx = jnp.arange(n_tiles)
    tile_ymin = ((tile_idx * tile_px) // width).astype(jnp.float32)
    tile_ymax = (((tile_idx + 1) * tile_px - 1) // width).astype(
        jnp.float32) + 1.0
    cummax = jax.lax.cummax(chunk_ymax, axis=1)
    ends = jnp.sum(chunk_ymin[:, None, :] <= tile_ymax[None, :, None], -1)
    starts = jnp.sum(cummax[:, None, :] < tile_ymin[None, :, None], -1)
    live = np.asarray(jnp.maximum(ends - jnp.minimum(starts, ends), 0))
    return {"n_chunks": int(n_chunks), "F": int(F),
            "mean_chunks_per_tile": round(float(live.mean()), 3),
            "tiles_total": int(live.size)}


def main():
    print("devices:", jax.devices(), flush=True)
    box = capture_inputs()
    dev = jax.devices()[0]
    vs = jax.device_put(jnp.asarray(box["vs"]), dev)
    attrs = jax.device_put(jnp.asarray(box["attrs"]), dev)
    faces = jax.device_put(jnp.asarray(box["faces"]), dev)
    fv = jax.device_put(jnp.asarray(box["fv"]), dev)
    height, width, kw = box["height"], box["width"], dict(box["kw"])
    kw.setdefault("tile_px", 512)
    kw.setdefault("sub_k", 8)
    print(json.dumps({"captured": True, "vs": list(vs.shape),
                      "faces": list(faces.shape), "h": height, "w": width,
                      "kw": {k: v for k, v in kw.items()}}), flush=True)
    print(json.dumps(chunk_stats(vs, attrs, faces, fv, height, width,
                                 kw["tile_px"], kw["sub_k"])), flush=True)

    raw = RP.rasterize_batch_pallas.__wrapped__
    orig_core = RP._tile_core

    def run(name, core=None, fv_override=None, **kwo):
        RP._tile_core = core if core is not None else orig_core
        try:
            f = jax.jit(raw, static_argnames=STATIC)
            k = dict(kw)
            k.update(kwo)
            t = timed_raster(f, vs, attrs, faces,
                             fv if fv_override is None else fv_override,
                             height, width, **k)
            print(json.dumps({"variant": name,
                              "raster_ms": round(t * 1e3, 2),
                              **{kk: vv for kk, vv in kwo.items()}}),
                  flush=True)
            return t
        finally:
            RP._tile_core = orig_core

    run("full")
    run("full_rep2")  # session-noise check
    run("pass1_only", core=tile_core_pass1_only)
    run("noloop", core=tile_core_noloop)
    run("novalid", fv_override=jnp.zeros_like(fv))
    run("subk14", sub_k=14)
    run("ewmax", core=tile_core_ewmax)

    # parity: ewmax vs production on the captured scene
    f_ref = jax.jit(raw, static_argnames=STATIC)
    out_ref = [np.asarray(o) for o in f_ref(vs, attrs, faces, fv,
                                            height, width, **kw)]
    RP._tile_core = tile_core_ewmax
    try:
        f_new = jax.jit(raw, static_argnames=STATIC)
        out_new = [np.asarray(o) for o in f_new(vs, attrs, faces, fv,
                                                height, width, **kw)]
    finally:
        RP._tile_core = orig_core
    # uv_mode returns (quv, shade, page, win, depth); compare all but win
    names = (["quv", "shade", "page", "win", "depth"]
             if kw.get("uv_mode") else ["rgb", "depth"])
    for nm, a, b in zip(names, out_ref, out_new):
        if nm == "win":
            continue
        diff = np.abs(a.astype(np.float64) - b.astype(np.float64))
        print(json.dumps({"parity": nm, "max_abs": float(diff.max()),
                          "frac_mismatch": float((diff > 0).mean())}),
              flush=True)


if __name__ == "__main__":
    main()
