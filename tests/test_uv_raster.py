"""Per-pixel UV texturing (VERDICT r2 item 2): the kernel's uv_mode
against the XLA reference interpolator, the winner-face id mapping, the
page channel ride-along, the 128-lane-row texel gather, and the
end-to-end textured scene against a host-sampled reference."""
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
    faces = rng.randint(0, V, (F, 3)).astype(np.int32)
    return jnp.asarray(verts), jnp.asarray(faces)


def _decode_uv(quv):
    u = np.floor(np.asarray(quv) / 4096.0) / 4095.0
    v = (np.asarray(quv) % 4096.0) / 4095.0
    return u, v


def _with_page(uvs, page_val):
    """Append a constant page channel (page must be constant per face)."""
    return jnp.concatenate(
        [uvs, jnp.full(uvs.shape[:-1] + (1,), float(page_val))], -1)


class TestUVKernel:
    def test_uv_mode_matches_xla_interpolation(self, rng):
        verts, faces = _scene(rng)
        H = W = 32
        uv = rng.rand(2, 40, 2).astype(np.float32)
        s = (rng.rand(2, 40) * 3.5).astype(np.float32)
        attrs = _with_page(jnp.asarray(np.concatenate([uv, s[..., None]], -1)), 5)
        a_ref, d_ref = rasterize_batch(verts, attrs, faces, None, H, W,
                                       face_chunk=16, row_chunk=8)
        quv, shade, page, win, d_out = rasterize_batch_pallas(
            verts, attrs, faces, None, H, W, tile_px=256, uv_mode=True)
        close_d = np.isclose(np.asarray(d_out), np.asarray(d_ref), atol=1e-3)
        assert close_d.mean() > 0.995
        u, v = _decode_uv(quv)
        ref = np.asarray(a_ref)
        # quantization floor: 1/4095 for uv, 4/65535 for shade; compare on
        # depth-agreeing pixels (ties at face boundaries may pick either)
        ok = close_d
        assert (np.abs(u - ref[..., 0]) < 3e-3)[ok].mean() > 0.995
        assert (np.abs(v - ref[..., 1]) < 3e-3)[ok].mean() > 0.995
        assert (np.abs(np.asarray(shade) - ref[..., 2]) < 2e-2)[ok].mean() > 0.995
        hit = np.asarray(d_out) > 0
        assert (np.asarray(page)[hit] == 5).all()

    def test_uv_winner_face_id(self, rng):
        """win_face is in the CALLER's face order (the kernel y-sorts
        internally; the permutation must be undone), and the page channel
        carries the winning face's page."""
        # two stacked triangles covering the same pixels, near in front
        verts = jnp.asarray([[
            [2.0, 2.0, 0.5], [30.0, 2.0, 0.5], [2.0, 30.0, 0.5],   # near
            [2.0, 2.0, 1.0], [30.0, 2.0, 1.0], [2.0, 30.0, 1.0],   # far
        ]])
        # order faces so the far one comes FIRST in caller order but
        # y-sorting could reorder arbitrarily
        faces = jnp.asarray([[3, 4, 5], [0, 1, 2]], jnp.int32)
        # near verts page 7, far verts page 3 (constant per face)
        vert_page = jnp.asarray([[7.0, 7.0, 7.0, 3.0, 3.0, 3.0]])[..., None]
        attrs = jnp.concatenate(
            [jnp.ones((1, 6, 3)) * 0.5, vert_page], -1)
        quv, shade, page, win, depth = rasterize_batch_pallas(
            verts, attrs, faces, None, 32, 32, tile_px=256, uv_mode=True)
        hit = np.asarray(depth) > 0
        assert hit.any()
        np.testing.assert_allclose(np.asarray(depth)[hit], 0.5, atol=1e-3)
        assert (np.asarray(win)[hit] == 1).all()   # the NEAR face, id 1
        assert (np.asarray(page)[hit] == 7).all()  # the NEAR page

    def test_uv_background_pixels(self, rng):
        verts, faces = _scene(rng, B=1)
        attrs = _with_page(
            jnp.asarray(rng.rand(1, 40, 3).astype(np.float32)), 2)
        quv, shade, page, win, depth = rasterize_batch_pallas(
            verts, attrs, faces, None, 32, 32, tile_px=256, uv_mode=True)
        bg = np.asarray(depth) == 0
        assert bg.any()
        np.testing.assert_allclose(np.asarray(quv)[bg], 0.0)
        np.testing.assert_allclose(np.asarray(shade)[bg], 0.0)
        np.testing.assert_allclose(np.asarray(page)[bg], 0)


class TestSampleTextures:
    def test_nearest_gather_and_pages(self):
        from artiboost_tpu.artiboost.renderer import SceneTextures, sample_textures

        T = 8
        atlas = np.zeros((2, T, T, 3), np.float32)
        atlas[0] = [1.0, 0.0, 0.0]                  # hand page: red
        atlas[1, 0, T - 1] = [0.0, 1.0, 0.0]        # obj page texel (tx=T-1, ty=0)
        tex = SceneTextures(
            atlas=jnp.asarray(atlas),
            hand_page=jnp.asarray([0]), obj_page=jnp.asarray([1]),
            uv=jnp.zeros((1, 4, 2)), n_hand_faces=10, n_hand_verts=2)
        # pixel A: page 0, uv (0.5, 0.5) -> red * shade 2 (clipped to 1)
        # pixel B: page 1, uv (1, 1) -> texel (T-1, 0) green
        quv = jnp.asarray([[[np.floor(0.5 * 4095) * 4096 + np.floor(0.5 * 4095),
                             4095.0 * 4096 + 4095.0]]])
        shade = jnp.asarray([[[2.0, 1.0]]])
        page = jnp.asarray([[[0, 1]]], jnp.int32)
        rgb = np.asarray(sample_textures(quv, shade, page, tex))
        np.testing.assert_allclose(rgb[0, 0, 0], [1.0, 0.0, 0.0], atol=1e-5)
        np.testing.assert_allclose(rgb[0, 0, 1], [0.0, 1.0, 0.0], atol=1e-5)

    def test_nearest_large_page_wide_texture(self):
        """T=256 exercises the multi-window (stride-127) row packing."""
        from artiboost_tpu.artiboost.renderer import SceneTextures, sample_textures

        T = 256
        rng = np.random.RandomState(3)
        atlas = rng.rand(3, T, T, 3).astype(np.float32)
        tex = SceneTextures(
            atlas=jnp.asarray(atlas), hand_page=jnp.asarray([0]),
            obj_page=jnp.asarray([2]), uv=jnp.zeros((1, 4, 2)),
            n_hand_faces=1, n_hand_verts=2)
        # probe texels across all three windows incl. the boundaries
        txs = np.asarray([0, 1, 126, 127, 128, 200, 253, 254, 255])
        tys = np.asarray([0, 3, 250, 255, 100, 17, 254, 1, 128])
        pages = np.asarray([0, 1, 2, 0, 1, 2, 0, 1, 2])
        u = txs / (T - 1)
        v = 1.0 - tys / (T - 1)
        quv = jnp.asarray(
            (np.floor(u * 4095 + 0.5) * 4096 + np.floor(v * 4095 + 0.5)
             )[None, None, :])
        shade = jnp.ones((1, 1, len(txs)))
        page = jnp.asarray(pages[None, None, :], jnp.int32)
        rgb = np.asarray(sample_textures(quv, shade, page, tex))[0, 0]
        # uv quantization (12 bits over 256 texels) keeps nearest exact;
        # rgb888 atlas packing quantizes values to 1/255
        want = atlas[pages, tys, txs]
        np.testing.assert_allclose(rgb, want, atol=1.0 / 255.0 + 1e-6)

    def test_subsample_uniform_page_exact(self):
        """With a constant-color page, quad-subsampled albedo is exact and
        shade stays per-pixel."""
        from artiboost_tpu.artiboost.renderer import SceneTextures, sample_textures

        T = 8
        atlas = np.full((1, T, T, 3), 0.5, np.float32)
        tex = SceneTextures(atlas=jnp.asarray(atlas),
                            hand_page=jnp.asarray([0]),
                            obj_page=jnp.asarray([0]),
                            uv=jnp.zeros((1, 1, 2)), n_hand_faces=1,
                            n_hand_verts=1)
        rng = np.random.RandomState(0)
        quv = jnp.asarray(
            np.floor(rng.rand(1, 4, 4) * 4095) * 4096
            + np.floor(rng.rand(1, 4, 4) * 4095))
        shade = jnp.asarray(rng.rand(1, 4, 4).astype(np.float32))
        page = jnp.zeros((1, 4, 4), jnp.int32)
        full = np.asarray(sample_textures(quv, shade, page, tex))
        sub = np.asarray(sample_textures(quv, shade, page, tex, subsample=2))
        np.testing.assert_allclose(sub, full, atol=1e-6)

    def test_subsample_foreground_bias(self):
        """A quad straddling a silhouette picks a FOREGROUND pixel's
        (page, texel), never the background zeros."""
        from artiboost_tpu.artiboost.renderer import SceneTextures, sample_textures

        T = 8
        atlas = np.zeros((2, T, T, 3), np.float32)
        atlas[1] = [0.0, 1.0, 0.0]  # fg page: green
        tex = SceneTextures(atlas=jnp.asarray(atlas),
                            hand_page=jnp.asarray([0]),
                            obj_page=jnp.asarray([1]),
                            uv=jnp.zeros((1, 1, 2)), n_hand_faces=1,
                            n_hand_verts=1)
        # one fg pixel (page 1) in a 2x2 quad of background zeros
        quv = jnp.zeros((1, 2, 2), jnp.float32).at[0, 1, 1].set(
            2000.0 * 4096 + 2000.0)
        shade = jnp.ones((1, 2, 2))
        page = jnp.zeros((1, 2, 2), jnp.int32).at[0, 1, 1].set(1)
        rgb = np.asarray(sample_textures(quv, shade, page, tex, subsample=2))
        np.testing.assert_allclose(rgb[0, 1, 1], [0.0, 1.0, 0.0], atol=1e-5)

    def test_bilinear_blends(self):
        from artiboost_tpu.artiboost.renderer import SceneTextures, sample_textures

        T = 4
        atlas = np.zeros((1, T, T, 3), np.float32)
        atlas[0, :, 0] = 0.0
        atlas[0, :, 1] = 1.0
        tex = SceneTextures(atlas=jnp.asarray(atlas),
                            hand_page=jnp.asarray([0]),
                            obj_page=jnp.asarray([0]),
                            uv=jnp.zeros((1, 1, 2)), n_hand_faces=1,
                            n_hand_verts=1)
        # u halfway between texel 0 and 1: tx = 0.5 -> blend to 0.5
        u = 0.5 / (T - 1)
        quv = jnp.asarray([[[np.floor(u * 4095 + 0.5) * 4096 + 0.0]]])
        shade = jnp.ones((1, 1, 1))
        page = jnp.zeros((1, 1, 1), jnp.int32)
        rgb = np.asarray(sample_textures(quv, shade, page, tex, bilinear=True))
        np.testing.assert_allclose(rgb[0, 0, 0], 0.5, atol=2e-3)


class TestTexturedSceneEndToEnd:
    def test_textured_render_matches_host_reference(self, rng):
        """Full textured path (shade+page planes in-kernel + 128-lane-row
        XLA gather) vs a host reference built from the XLA interpolator +
        numpy texel fetch — the golden demanded by VERDICT r2 item 2."""
        from artiboost_tpu.artiboost.renderer import (SceneTextures,
                                                      sample_textures,
                                                      shade_intensity)
        from artiboost_tpu.ops.rasterizer import vertex_normals

        B, V, F, H, W = 2, 60, 80, 32, 32
        verts_cam = np.zeros((B, V, 3), np.float32)
        verts_cam[..., :2] = (rng.rand(B, V, 2) - 0.5) * 0.2
        verts_cam[..., 2] = 0.4 + rng.rand(B, V) * 0.2
        verts_cam = jnp.asarray(verts_cam)
        # page is a per-vertex attribute: hand/object vertex ranges must
        # be disjoint (they are in production scenes)
        n_hand_verts = 30
        faces = np.concatenate([
            rng.randint(0, n_hand_verts, (40, 3)),
            n_hand_verts + rng.randint(0, V - n_hand_verts, (F - 40, 3)),
        ]).astype(np.int32)
        faces = jnp.asarray(faces)
        faces_b = jnp.broadcast_to(faces[None], (B, F, 3))
        uv = jnp.asarray(rng.rand(B, V, 2).astype(np.float32))
        atlas = jnp.asarray(rng.rand(3, 16, 16, 3).astype(np.float32))
        tex = SceneTextures(atlas=atlas,
                            hand_page=jnp.asarray([0, 1]),
                            obj_page=jnp.asarray([2, 2]),
                            uv=uv, n_hand_faces=40, n_hand_verts=n_hand_verts)
        normals = jax.vmap(vertex_normals)(verts_cam, faces_b)
        light_pos = jnp.asarray([[0.3, -0.3, -0.3]])
        light_int = jnp.asarray([[0.1], [0.2]])
        s = shade_intensity(verts_cam, normals, 0.8, light_pos, light_int)

        from artiboost_tpu.ops.rasterizer import project_verts

        vs = jax.vmap(lambda v: project_verts(v, 120.0, 120.0, W / 2, H / 2)
                      )(verts_cam)
        vp = jnp.where(jnp.arange(V)[None, :] < n_hand_verts,
                       tex.hand_page[:, None].astype(jnp.float32),
                       tex.obj_page[:, None].astype(jnp.float32))
        attrs = jnp.concatenate([uv, s[..., None], vp[..., None]], -1)
        quv, sh, pg, win, depth = rasterize_batch_pallas(
            vs, attrs, faces, None, H, W, tile_px=256, uv_mode=True)
        out = np.asarray(sample_textures(quv, sh, pg, tex))

        # the page channel must agree with the winning face's side
        hit = np.asarray(depth) > 0
        page_from_win = np.where(np.asarray(win) < 40,
                                 np.asarray(tex.hand_page)[:, None, None],
                                 np.asarray(tex.obj_page)[:, None, None])
        assert (np.asarray(pg)[hit] == page_from_win[hit]).all()

        # host reference: XLA interpolation + numpy nearest fetch
        a_ref, d_ref = rasterize_batch(vs, attrs, faces, None, H, W,
                                       face_chunk=16, row_chunk=8)
        a_ref, d_ref = np.asarray(a_ref), np.asarray(d_ref)
        ok = np.isclose(np.asarray(depth), d_ref, atol=1e-3) & (d_ref > 0)
        assert ok.mean() > 0.1  # scene actually covers pixels
        T = atlas.shape[1]
        ix = np.round(np.clip(a_ref[..., 0], 0, 1) * (T - 1)).astype(int)
        iy = np.round((1.0 - np.clip(a_ref[..., 1], 0, 1)) * (T - 1)).astype(int)
        albedo = np.asarray(atlas)[page_from_win, iy, ix]
        ref_rgb = np.clip(albedo * a_ref[..., 2:3], 0, 1)
        good = (np.abs(out - ref_rgb).max(-1) < 0.05)[ok]
        assert good.mean() > 0.98

    def test_synth_batch_textured_runs_and_differs(self):
        """The default synth pipeline is per-pixel textured; switching
        texturing off changes foreground pixels (texture detail exists)."""
        from artiboost_tpu.artiboost.grasp_library import synthetic_grasp_library
        from artiboost_tpu.artiboost.object_library import synthetic_object_library
        from artiboost_tpu.artiboost.pose_generator import make_pose_generator
        from artiboost_tpu.artiboost.refiner import build_refiner
        from artiboost_tpu.artiboost.renderer import default_render_assets
        from artiboost_tpu.artiboost.scrambler import build_scrambler
        from artiboost_tpu.artiboost.synth_batch import (SynthConfig,
                                                         make_synth_batch_fn)
        from artiboost_tpu.artiboost.view_engine import ViewEngineConfig
        from artiboost_tpu.datasets.hoquery import Queries
        from artiboost_tpu.mano.model import get_mano_model

        mano = get_mano_model()
        obj_lib = synthetic_object_library(["a", "b"])
        assert obj_lib.uvs is not None and obj_lib.textures is not None
        grasp_lib = synthetic_grasp_library(2, 5)
        assets = default_render_assets(mano)
        assert assets.hand_textures is not None
        gen_fn = make_pose_generator(
            mano, obj_lib, grasp_lib, ViewEngineConfig(4, 6),
            build_scrambler({"TYPE": "naive", "HAND_TSL_SIGMA": 0.0,
                             "HAND_POSE_SIGMA": 0.0}),
            build_refiner({"TYPE": "null"}, mano))
        rng = np.random.RandomState(0)
        B = 2
        gen = gen_fn(jax.random.PRNGKey(0),
                     jnp.asarray(rng.randint(0, 2, B)),
                     jnp.asarray(rng.randint(0, 24, B)),
                     jnp.asarray(rng.randint(0, 5, B)))
        base = dict(image_size=128, fx=200.0, fy=200.0, cx=64.0, cy=64.0,
                    aug=False)
        key, idx = jax.random.PRNGKey(1), jnp.arange(B)
        tex_fn = make_synth_batch_fn(mano, obj_lib, assets,
                                     SynthConfig(textured=True, **base))
        flat_fn = make_synth_batch_fn(mano, obj_lib, assets,
                                      SynthConfig(textured=False, **base))
        img_t = np.asarray(tex_fn(key, gen, idx)[Queries.IMAGE])
        img_f = np.asarray(flat_fn(key, gen, idx)[Queries.IMAGE])
        assert np.isfinite(img_t).all()
        delta = np.abs(img_t - img_f)
        assert delta.max() > 0.05     # texture detail present
        assert delta.mean() < 0.05    # but the scene is the same scene
