import jax.numpy as jnp
import numpy as np
import pytest

from artiboost_tpu.ops.rasterizer import (
    build_screen_faces,
    project_verts,
    rasterize,
    rasterize_batch,
    shade_vertices,
    vertex_normals,
)


def numpy_golden_raster(verts_screen, vert_attrs, faces, H, W):
    """Slow but obviously-correct per-pixel raster with perspective-correct
    interpolation. Oracle for the XLA/Pallas implementations."""
    A = vert_attrs.shape[-1]
    depth = np.zeros((H, W), np.float32)
    attrs = np.zeros((H, W, A), np.float32)
    best_w = np.full((H, W), -np.inf, np.float32)
    for f in faces:
        v = verts_screen[f]  # (3, 3)
        a = vert_attrs[f]
        x, y, z = v[:, 0], v[:, 1], v[:, 2]
        area = (x[1] - x[0]) * (y[2] - y[0]) - (x[2] - x[0]) * (y[1] - y[0])
        if abs(area) < 1e-9:
            continue
        xmin = max(int(np.floor(x.min())), 0)
        xmax = min(int(np.ceil(x.max())), W - 1)
        ymin = max(int(np.floor(y.min())), 0)
        ymax = min(int(np.ceil(y.max())), H - 1)
        for py in range(ymin, ymax + 1):
            for px in range(xmin, xmax + 1):
                pxc, pyc = px + 0.5, py + 0.5
                lam = np.empty(3)
                for k in range(3):
                    k1, k2 = (k + 1) % 3, (k + 2) % 3
                    lam[k] = (x[k2] - x[k1]) * (pyc - y[k1]) - (y[k2] - y[k1]) * (pxc - x[k1])
                lam = lam / area
                if np.any(lam < 0):
                    continue
                w = np.sum(lam / z)
                if w > best_w[py, px]:
                    best_w[py, px] = w
                    depth[py, px] = 1.0 / w
                    attrs[py, px] = (lam / z) @ a / w
    return attrs, depth


def _make_triangle_scene():
    """One near triangle partially occluding a far one."""
    verts = np.array([
        # near red triangle at z=0.5
        [8.0, 4.0, 0.5], [24.0, 4.0, 0.5], [16.0, 20.0, 0.5],
        # far blue triangle at z=1.0, bigger
        [4.0, 8.0, 1.0], [28.0, 8.0, 1.0], [16.0, 28.0, 1.0],
    ], np.float32)
    attrs = np.array([
        [1, 0, 0], [1, 0, 0], [1, 0, 0],
        [0, 0, 1], [0, 0, 1], [0, 0, 1],
    ], np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    return verts, attrs, faces


class TestRasterizerVsGolden:
    def test_two_triangles(self):
        verts, attrs, faces = _make_triangle_scene()
        H = W = 32
        a_ref, d_ref = numpy_golden_raster(verts, attrs, faces, H, W)
        a_out, d_out = rasterize(
            jnp.asarray(verts), jnp.asarray(attrs), jnp.asarray(faces), None, H, W,
            face_chunk=2, row_chunk=8)
        # pixels exactly on edges may tie-break differently: 99.5%+ identical
        close_d = np.isclose(np.asarray(d_out), d_ref, atol=1e-4)
        close_a = np.all(np.isclose(np.asarray(a_out), a_ref, atol=1e-4), axis=-1)
        assert close_d.mean() > 0.995 and close_a.mean() > 0.995

    def test_random_mesh_vs_golden(self, rng):
        V, F, H, W = 40, 60, 48, 48
        verts = np.zeros((V, 3), np.float32)
        verts[:, 0] = rng.rand(V) * W
        verts[:, 1] = rng.rand(V) * H
        verts[:, 2] = 0.3 + rng.rand(V)
        attrs = rng.rand(V, 3).astype(np.float32)
        faces = rng.randint(0, V, (F, 3)).astype(np.int32)
        a_ref, d_ref = numpy_golden_raster(verts, attrs, faces, H, W)
        a_out, d_out = rasterize(
            jnp.asarray(verts), jnp.asarray(attrs), jnp.asarray(faces), None, H, W,
            face_chunk=16, row_chunk=16)
        # edge pixels may differ by tie-breaks: require 99%+ agreement
        close = np.isclose(np.asarray(d_out), d_ref, atol=1e-3)
        assert close.mean() > 0.99
        close_a = np.all(np.isclose(np.asarray(a_out), a_ref, atol=1e-2), axis=-1)
        assert close_a.mean() > 0.99

    def test_winding_agnostic(self):
        verts, attrs, faces = _make_triangle_scene()
        flipped = faces[:, ::-1].copy()
        H = W = 32
        a1, d1 = rasterize(jnp.asarray(verts), jnp.asarray(attrs), jnp.asarray(faces),
                           None, H, W, face_chunk=2, row_chunk=8)
        a2, d2 = rasterize(jnp.asarray(verts), jnp.asarray(attrs), jnp.asarray(flipped),
                           None, H, W, face_chunk=2, row_chunk=8)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)

    def test_face_valid_mask(self):
        verts, attrs, faces = _make_triangle_scene()
        H = W = 32
        mask = jnp.asarray([1.0, 0.0])  # hide far triangle
        a, d = rasterize(jnp.asarray(verts), jnp.asarray(attrs), jnp.asarray(faces),
                         mask, H, W, face_chunk=2, row_chunk=8)
        d = np.asarray(d)
        assert not np.any(np.isclose(d, 1.0))  # far triangle gone
        assert np.any(np.isclose(d, 0.5))

    def test_backface_cull_sign_and_identity(self):
        """Culling keeps exactly the outward-facing (normal·view < 0)
        faces of a consistently-wound closed mesh, and the rendered image
        of a closed mesh is identical with or without culling (the
        z-buffer already hides every backface)."""
        from artiboost_tpu.artiboost.object_library import synthetic_object_library

        lib = synthetic_object_library(["box", "cyl"])
        for o in range(2):
            v = np.asarray(lib.verts[o]) + [0.0, 0.0, 0.5]
            f = np.asarray(lib.faces[o])
            fvd = np.asarray(lib.face_valid[o])
            vs = project_verts(jnp.asarray(v), 435.0, 435.0, 112.0, 112.0)
            colors = jnp.asarray(lib.colors[o])
            sf = build_screen_faces(vs, colors, jnp.asarray(f),
                                    jnp.asarray(fvd), cull_backfaces=True)
            kept = np.asarray(sf.valid) > 0
            fvs = v[f]
            n = np.cross(fvs[:, 1] - fvs[:, 0], fvs[:, 2] - fvs[:, 0])
            front = ((n * fvs.mean(1)).sum(-1) < 0) & (fvd > 0)
            assert (kept == front)[fvd > 0].all()

            H = W = 64
            a0, d0 = rasterize(vs, colors, jnp.asarray(f), jnp.asarray(fvd),
                               H, W, cull_backfaces=False)
            a1, d1 = rasterize(vs, colors, jnp.asarray(f), jnp.asarray(fvd),
                               H, W, cull_backfaces=True)
            np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-6)
            np.testing.assert_allclose(np.asarray(a0), np.asarray(a1), atol=1e-5)

    def test_batched(self, rng):
        verts, attrs, faces = _make_triangle_scene()
        H = W = 32
        vb = np.stack([verts, verts + [2.0, 0, 0]])
        ab = np.stack([attrs, attrs])
        out_a, out_d = rasterize_batch(
            jnp.asarray(vb), jnp.asarray(ab), jnp.asarray(faces), None, H, W,
            face_chunk=2, row_chunk=8)
        assert out_a.shape == (2, H, W, 3)
        # second image shifted right by 2px
        d0, d1 = np.asarray(out_d[0]), np.asarray(out_d[1])
        np.testing.assert_allclose(d0[:, :-2][d0[:, :-2] > 0].sum(),
                                   d1[:, 2:][d1[:, 2:] > 0].sum(), rtol=0.05)


class TestProjection:
    def test_project_verts(self):
        v = jnp.asarray([[[0.0, 0.0, 0.5], [0.1, -0.05, 0.5]]])
        out = np.asarray(project_verts(v, 435.0, 435.0, 112.0, 112.0))
        np.testing.assert_allclose(out[0, 0], [112, 112, 0.5], atol=1e-5)
        np.testing.assert_allclose(out[0, 1, 0], 112 + 0.1 / 0.5 * 435, rtol=1e-5)


class TestShading:
    def test_normals_unit(self, rng):
        from artiboost_tpu.mano import synthetic_mano_model
        m = synthetic_mano_model()
        n = np.asarray(vertex_normals(m.v_template, m.faces))
        norms = np.linalg.norm(n, axis=1)
        assert np.all(norms > 0.99) and np.all(norms < 1.01)

    def test_indexed_normals_match_scatter(self, rng):
        """vertex_normals_indexed (gather-only, precomputed incidence)
        reproduces the scatter-add vertex_normals exactly, including
        padded degenerate faces and a composed hand+object scene."""
        import jax

        from artiboost_tpu.artiboost.object_library import synthetic_object_library
        from artiboost_tpu.artiboost.renderer import build_scene_incidence
        from artiboost_tpu.mano import synthetic_mano_model
        from artiboost_tpu.ops.rasterizer import (
            build_face_incidence, vertex_normals_indexed)

        m = synthetic_mano_model()
        # single mesh parity
        inc = jnp.asarray(build_face_incidence(np.asarray(m.faces),
                                               m.v_template.shape[0]))
        B = 3
        verts = jnp.asarray(
            np.asarray(m.v_template)[None]
            + rng.randn(B, m.v_template.shape[0], 3).astype(np.float32) * 0.002)
        faces_b = jnp.broadcast_to(m.faces[None], (B,) + m.faces.shape)
        ref = jax.vmap(vertex_normals)(verts, jnp.asarray(faces_b))
        out = vertex_normals_indexed(verts, faces_b,
                                     jnp.broadcast_to(inc[None], (B,) + inc.shape))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

        # composed scene (padded object faces present)
        ol = synthetic_object_library(["a", "b"])
        scene_inc = build_scene_incidence(m.faces, ol, n_hand=m.v_template.shape[0])
        oid = jnp.asarray([0, 1, 0], jnp.int32)
        V = m.v_template.shape[0] + ol.verts.shape[1]
        sverts = jnp.asarray(rng.randn(B, V, 3).astype(np.float32) * 0.05)
        sfaces = jnp.concatenate([
            jnp.broadcast_to(m.faces[None], (B,) + m.faces.shape),
            ol.faces[oid] + m.v_template.shape[0]], axis=1)
        ref = jax.vmap(vertex_normals)(sverts, sfaces)
        out = vertex_normals_indexed(sverts, sfaces, scene_inc[oid])
        # padded-vertex rows (no valid incident faces) normalize garbage in
        # both paths; compare where the reference has a defined normal
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_ambient_only(self):
        verts = jnp.zeros((4, 3))
        normals = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (4, 1))
        base = jnp.ones((4, 3)) * 0.5
        out = np.asarray(shade_vertices(verts, normals, base, ambient=0.8))
        np.testing.assert_allclose(out, 0.4, atol=1e-6)

    def test_point_light_falloff(self):
        verts = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        normals = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (2, 1))
        base = jnp.ones((2, 3))
        out = np.asarray(shade_vertices(
            verts, normals, base, ambient=0.0,
            light_pos=jnp.asarray([[0.0, 0.0, -1.0]]),
            light_intensity=jnp.asarray([1.0]),
            light_color=jnp.ones((1, 3)),
        ))
        # nearer vertex brighter; 1/d^2: d=1 vs d=2 -> 4x
        np.testing.assert_allclose(out[0] / out[1], 4.0, rtol=1e-3)


class TestMotionBlur:
    def test_kernel_is_horizontal_box(self):
        """Impulse response = centered horizontal line of ones/k — the
        reference's get_motion_blur_k (anakin/utils/renderer.py:32-37)."""
        from artiboost_tpu.artiboost.renderer import _motion_blur_h

        img = jnp.zeros((1, 9, 9, 3)).at[0, 4, 4].set(1.0)
        out = np.asarray(_motion_blur_h(img, 5))
        want = np.zeros((9, 9, 3), np.float32)
        want[4, 2:7] = 1.0 / 5.0
        np.testing.assert_allclose(out[0], want, atol=1e-6)
        # rows above/below untouched (no vertical mixing)
        assert np.all(out[0, 3] == 0) and np.all(out[0, 5] == 0)

    def test_render_scene_gate(self, rng):
        """motion_blur=0 (reference training default) is a no-op;
        motion_blur=7 changes foreground pixels but composites the SAME
        sharp background (blur runs pre-composite, renderer.py:113-116)."""
        import jax

        from artiboost_tpu.artiboost.renderer import render_scene

        B, V = 2, 64
        verts = jnp.asarray(rng.randn(B, V, 3).astype(np.float32) * 0.05)
        verts = verts.at[..., 2].add(0.5)
        faces = jnp.asarray(rng.randint(0, V, (B, 60, 3)).astype(np.int32))
        colors = jnp.ones((B, V, 3)) * 0.8
        fvalid = jnp.ones((B, 60))
        intr = jnp.tile(jnp.asarray([[120.0, 0, 32], [0, 120.0, 32], [0, 0, 1.0]]),
                        (B, 1, 1))
        bgs = jnp.asarray(rng.rand(2, 96, 96, 3).astype(np.float32))
        key = jax.random.PRNGKey(3)
        sharp, depth = render_scene(verts, colors, faces, fvalid, intr, bgs,
                                    key, 64, 64, motion_blur=0)
        same, _ = render_scene(verts, colors, faces, fvalid, intr, bgs,
                               key, 64, 64)  # default off
        np.testing.assert_allclose(np.asarray(sharp), np.asarray(same))
        blurred, depth_b = render_scene(verts, colors, faces, fvalid, intr, bgs,
                                        key, 64, 64, motion_blur=7)
        np.testing.assert_allclose(np.asarray(depth), np.asarray(depth_b))
        fg = np.asarray(depth) > 0
        assert fg.any()
        ds, db = np.asarray(sharp), np.asarray(blurred)
        # background pixels identical; some foreground pixels change
        np.testing.assert_allclose(ds[~fg], db[~fg])
        assert np.abs(ds[fg] - db[fg]).max() > 1e-4
