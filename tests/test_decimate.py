"""Render LOD (ops/decimate.py + renderer.build_scene_lod): face budgets
hold, thin surfaces survive the normal-split clustering, the dynamic-hand
variant is a pure gather, and the decimated render stays visually bounded
against the full-resolution render (VERDICT r2 item 1)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from artiboost_tpu.artiboost.object_library import synthetic_object_library
from artiboost_tpu.mano import synthetic_mano_model
from artiboost_tpu.ops.decimate import (
    _vertex_normals_np,
    decimate_mesh,
    decimate_topology,
)


def _uv_sphere(n_u=48, n_v=24, r=0.1):
    vs, fs = [], []
    for i in range(n_v + 1):
        th = np.pi * i / n_v
        for j in range(n_u):
            ph = 2 * np.pi * j / n_u
            vs.append([r * np.sin(th) * np.cos(ph),
                       r * np.sin(th) * np.sin(ph), r * np.cos(th)])
    for i in range(n_v):
        for j in range(n_u):
            a = i * n_u + j
            b = i * n_u + (j + 1) % n_u
            fs.append([a, b, a + n_u])
            fs.append([b, b + n_u, a + n_u])
    return np.asarray(vs, np.float32), np.asarray(fs, np.int32)


class TestDecimateMesh:
    def test_budget_and_bounds(self):
        verts, faces = _uv_sphere()
        assert faces.shape[0] > 2000
        nv, nf, _ = decimate_mesh(verts, faces, 400)
        assert 0 < nf.shape[0] <= 400
        assert nf.max() < nv.shape[0] and nf.min() >= 0
        # cluster means stay inside the original bounds
        assert np.all(nv.min(0) >= verts.min(0) - 1e-6)
        assert np.all(nv.max(0) <= verts.max(0) + 1e-6)
        # no degenerate faces
        assert np.all(nf[:, 0] != nf[:, 1])
        assert np.all(nf[:, 1] != nf[:, 2])

    def test_winding_preserved(self):
        """Outward-wound sphere stays predominantly outward after
        decimation (backface culling stays valid on LOD meshes)."""
        verts, faces = _uv_sphere()
        fv = verts[faces]
        n = np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
        flip = (n * fv.mean(1)).sum(-1) < 0
        faces[flip] = faces[flip][:, ::-1]
        nv, nf, _ = decimate_mesh(verts, faces, 400)
        fv = nv[nf]
        n = np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
        outward = ((n * fv.mean(1)).sum(-1) > 0).mean()
        assert outward > 0.95

    def test_thin_sheet_survives(self):
        """Two parallel planes 2mm apart, opposite winding: normal-split
        clustering must NOT weld them even with huge cells."""
        g = np.linspace(0, 0.2, 12)
        vs, fs = [], []
        for z, flipped in ((0.0, False), (0.002, True)):
            base = len(vs)
            for a in g:
                for b in g:
                    vs.append([a, b, z])
            for i in range(11):
                for j in range(11):
                    p = base + i * 12 + j
                    f1, f2 = [p, p + 1, p + 12], [p + 1, p + 13, p + 12]
                    if flipped:
                        f1, f2 = f1[::-1], f2[::-1]
                    vs_dummy = None  # noqa
                    fs += [f1, f2]
        verts = np.asarray(vs, np.float32)
        faces = np.asarray(fs, np.int32)
        nv, nf, _ = decimate_mesh(verts, faces, 60)
        assert nf.shape[0] <= 60 and nf.shape[0] > 0
        # both z-levels represented among used vertices
        used = np.unique(nf)
        z = nv[used][:, 2]
        assert (z < 0.001).any() and (z > 0.001).any()

    def test_colors_averaged(self):
        verts, faces = _uv_sphere()
        colors = np.tile(np.array([[0.25, 0.5, 0.75]], np.float32),
                         (verts.shape[0], 1))
        _, _, nc = decimate_mesh(verts, faces, 300, colors)
        np.testing.assert_allclose(
            nc, np.broadcast_to([0.25, 0.5, 0.75], nc.shape), atol=1e-6)

    def test_under_budget_is_identity(self):
        verts, faces = _uv_sphere(8, 4)
        nv, nf, _ = decimate_mesh(verts, faces, 10_000)
        assert nv is verts and nf is faces


class TestDecimateTopology:
    def test_hand_gather_lod(self):
        m = synthetic_mano_model()
        tmpl = np.asarray(m.v_template)
        faces = np.asarray(m.faces)
        rep, nf = decimate_topology(tmpl, faces, 512)
        assert 0 < nf.shape[0] <= 512
        assert rep.min() >= 0 and rep.max() < tmpl.shape[0]
        assert len(np.unique(rep)) == rep.shape[0]  # distinct originals
        assert nf.max() < rep.shape[0]
        # gather semantics: LOD verts ARE original surface points
        lod_pts = tmpl[rep]
        d = np.linalg.norm(lod_pts[:, None] - tmpl[None], axis=-1).min(1)
        assert d.max() == 0.0


class TestSceneLODRender:
    @pytest.fixture(scope="class")
    def pipeline(self):
        from artiboost_tpu.artiboost.grasp_library import synthetic_grasp_library
        from artiboost_tpu.artiboost.pose_generator import make_pose_generator
        from artiboost_tpu.artiboost.refiner import build_refiner
        from artiboost_tpu.artiboost.renderer import default_render_assets
        from artiboost_tpu.artiboost.scrambler import build_scrambler
        from artiboost_tpu.artiboost.synth_batch import (SynthConfig,
                                                         make_synth_batch_fn)
        from artiboost_tpu.artiboost.view_engine import ViewEngineConfig
        from artiboost_tpu.mano.model import get_mano_model

        mano = get_mano_model()
        obj_lib = synthetic_object_library(["a", "b"])
        grasp_lib = synthetic_grasp_library(2, 5)
        assets = default_render_assets(mano)
        gen_fn = make_pose_generator(
            mano, obj_lib, grasp_lib, ViewEngineConfig(4, 6),
            build_scrambler({"TYPE": "naive", "HAND_TSL_SIGMA": 0.0,
                             "HAND_POSE_SIGMA": 0.0}),
            build_refiner({"TYPE": "null"}, mano))
        rng = np.random.RandomState(0)
        B = 4
        gen = gen_fn(jax.random.PRNGKey(0),
                     jnp.asarray(rng.randint(0, 2, B)),
                     jnp.asarray(rng.randint(0, 24, B)),
                     jnp.asarray(rng.randint(0, 5, B)))
        cfg = dict(image_size=128, fx=200.0, fy=200.0, cx=64.0, cy=64.0,
                   aug=False)  # aug off -> deterministic geometry
        full = make_synth_batch_fn(mano, obj_lib, assets,
                                   SynthConfig(lod_faces=0, **cfg))
        lod = make_synth_batch_fn(mano, obj_lib, assets,
                                  SynthConfig(lod_faces=512, **cfg))
        lod256 = make_synth_batch_fn(mano, obj_lib, assets,
                                     SynthConfig(lod_faces=256, **cfg))
        key = jax.random.PRNGKey(1)
        idx = jnp.arange(B)
        return full(key, gen, idx), lod(key, gen, idx), lod256(key, gen, idx)

    def test_supervision_identical(self, pipeline):
        """LOD is render-only: every non-image tensor is bit-identical."""
        from artiboost_tpu.datasets.hoquery import Queries

        full, lod, _ = pipeline
        for k in full:
            if k == Queries.IMAGE:
                continue
            np.testing.assert_array_equal(
                np.asarray(full[k]), np.asarray(lod[k]), err_msg=str(k))

    def test_image_delta_bounded(self, pipeline):
        """Silhouette + shading changes stay small at 512-face budgets:
        mean abs pixel delta < 0.03, and <15% of pixels move by >0.1."""
        from artiboost_tpu.datasets.hoquery import Queries

        full, lod, lod256 = pipeline
        a = np.asarray(full[Queries.IMAGE])
        b = np.asarray(lod[Queries.IMAGE])
        delta = np.abs(a - b)
        assert delta.mean() < 0.03
        assert (delta.max(-1) > 0.1).mean() < 0.15
        # the LOD image still has real foreground content
        assert b.std() > 0.01
        # the 256 default (probe-chosen, script/probe_lod.py) is coarser
        # but still bounded
        c = np.asarray(lod256[Queries.IMAGE])
        delta256 = np.abs(a - c)
        assert delta256.mean() < 0.05
        assert (delta256.max(-1) > 0.1).mean() < 0.25
        assert c.std() > 0.01
