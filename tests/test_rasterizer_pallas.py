"""Pallas rasterizer vs the XLA reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from artiboost_tpu.ops.rasterizer import rasterize_batch
from artiboost_tpu.ops.rasterizer_pallas import rasterize_batch_pallas


def _scene(rng, B=2, V=40, F=60, H=32, W=32, z0=0.3):
    verts = np.zeros((B, V, 3), np.float32)
    verts[..., 0] = rng.rand(B, V) * W
    verts[..., 1] = rng.rand(B, V) * H
    verts[..., 2] = z0 + rng.rand(B, V)
    attrs = rng.rand(B, V, 3).astype(np.float32)
    faces = rng.randint(0, V, (F, 3)).astype(np.int32)
    return jnp.asarray(verts), jnp.asarray(attrs), jnp.asarray(faces)


@pytest.mark.parametrize("tile_px", [256, 512])
def test_pallas_matches_xla(rng, tile_px):
    verts, attrs, faces = _scene(rng)
    H = W = 32
    a_ref, d_ref = rasterize_batch(verts, attrs, faces, None, H, W,
                                   face_chunk=16, row_chunk=8)
    a_out, d_out = rasterize_batch_pallas(verts, attrs, faces, None, H, W,
                                          tile_px=tile_px)
    close_d = np.isclose(np.asarray(d_out), np.asarray(d_ref), atol=1e-3)
    assert close_d.mean() > 0.995
    close_a = np.all(np.isclose(np.asarray(a_out), np.asarray(a_ref), atol=1e-2), axis=-1)
    assert close_a.mean() > 0.995


def test_pallas_face_mask(rng):
    verts, attrs, faces = _scene(rng, B=1)
    H = W = 32
    mask = jnp.zeros((1, faces.shape[0]))
    _, d_out = rasterize_batch_pallas(verts, attrs, faces, mask, H, W, tile_px=256)
    np.testing.assert_allclose(np.asarray(d_out), 0.0, atol=1e-6)


def test_pallas_nonsquare(rng):
    verts, attrs, faces = _scene(rng, H=24, W=40)
    a, d = rasterize_batch_pallas(verts, attrs, faces, None, 24, 40, tile_px=256)
    assert a.shape == (2, 24, 40, 3) and d.shape == (2, 24, 40)
    assert np.asarray(d).max() > 0


@pytest.mark.parametrize("sub_k", [1, 4])
def test_pallas_out_ct_layouts_identical(rng, sub_k):
    """Channel-transposed output block (out_ct, the production default at
    lane-aligned tiles) is bit-identical to the (TP, 4) layout — same
    kernel math, only the block->HBM DMA shape changes."""
    verts, attrs, faces = _scene(rng)
    H = W = 32
    a_ref, d_ref = rasterize_batch_pallas(verts, attrs, faces, None, H, W,
                                          tile_px=256, sub_k=sub_k,
                                          out_ct=False)
    a, d = rasterize_batch_pallas(verts, attrs, faces, None, H, W,
                                  tile_px=256, sub_k=sub_k, out_ct=True)
    np.testing.assert_array_equal(np.asarray(d), np.asarray(d_ref))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a_ref))


def test_pallas_out_ct_uv_mode(rng):
    """out_ct layout parity in uv_mode (4-attr raw planes)."""
    verts, _, faces = _scene(rng)
    B, V = verts.shape[:2]
    uvsp = np.zeros((B, V, 4), np.float32)
    uvsp[..., 0] = np.random.RandomState(0).rand(B, V) * 4095
    uvsp[..., 1] = np.random.RandomState(1).rand(B, V) * 4095
    uvsp[..., 2] = np.random.RandomState(2).rand(B, V) * 4
    uvsp[..., 3] = 1.0
    uvsp = jnp.asarray(uvsp)
    H = W = 32
    ref = rasterize_batch_pallas(verts, uvsp, faces, None, H, W,
                                 tile_px=256, sub_k=4, uv_mode=True,
                                 out_ct=False)
    out = rasterize_batch_pallas(verts, uvsp, faces, None, H, W,
                                 tile_px=256, sub_k=4, uv_mode=True,
                                 out_ct=True)
    for o, r in zip(out, ref):
        np.testing.assert_array_equal(np.asarray(o), np.asarray(r))


@pytest.mark.parametrize("xbin_w,tile_rows", [(16, 8), (8, 4)])
def test_pallas_binned_matches_1d(rng, xbin_w, tile_rows):
    """2D x-binned path is pixel-identical to the 1D y-culled path
    (same packed planes, same depth-test tie-breaking)."""
    verts, attrs, faces = _scene(rng)
    H = W = 32
    a_ref, d_ref = rasterize_batch_pallas(verts, attrs, faces, None, H, W,
                                          tile_px=256)
    a_out, d_out = rasterize_batch_pallas(verts, attrs, faces, None, H, W,
                                          xbin_w=xbin_w, tile_rows=tile_rows)
    np.testing.assert_allclose(np.asarray(d_out), np.asarray(d_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a_out), np.asarray(a_ref), atol=1e-6)


def test_pallas_binned_matches_xla(rng):
    verts, attrs, faces = _scene(rng)
    H = W = 32
    a_ref, d_ref = rasterize_batch(verts, attrs, faces, None, H, W,
                                   face_chunk=16, row_chunk=8)
    a_out, d_out = rasterize_batch_pallas(verts, attrs, faces, None, H, W,
                                          xbin_w=16, tile_rows=8)
    close_d = np.isclose(np.asarray(d_out), np.asarray(d_ref), atol=1e-3)
    assert close_d.mean() > 0.995
    close_a = np.all(np.isclose(np.asarray(a_out), np.asarray(a_ref), atol=1e-2), axis=-1)
    assert close_a.mean() > 0.995


def test_pallas_binned_nonmultiple_dims(rng):
    """H not a multiple of tile_rows, W not a multiple of xbin_w."""
    verts, attrs, faces = _scene(rng, H=24, W=40)
    a_ref, d_ref = rasterize_batch_pallas(verts, attrs, faces, None, 24, 40,
                                          tile_px=256)
    a, d = rasterize_batch_pallas(verts, attrs, faces, None, 24, 40,
                                  xbin_w=16, tile_rows=5)
    assert a.shape == (2, 24, 40, 3) and d.shape == (2, 24, 40)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a_ref), atol=1e-6)
