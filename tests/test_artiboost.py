import jax
import jax.numpy as jnp
import numpy as np
import pytest

from artiboost_tpu.artiboost.ccv import (
    build_blacklist_map,
    flat_to_ovg,
    init_ccv_space,
    ovg_to_flat,
    sample_triplets,
)
from artiboost_tpu.artiboost.grasp_library import synthetic_grasp_library
from artiboost_tpu.artiboost.loader import ArtiBoostLoader
from artiboost_tpu.artiboost.mining import UPDATE_METHODS
from artiboost_tpu.artiboost.object_library import synthetic_object_library
from artiboost_tpu.artiboost.pose_generator import decode_final_hand, make_pose_generator
from artiboost_tpu.artiboost.refiner import build_refiner
from artiboost_tpu.artiboost.scrambler import SCRAMBLER_REGISTRY, build_scrambler
from artiboost_tpu.artiboost.view_engine import (
    ViewEngineConfig,
    persp_rotmat_centers,
    sample_view,
)
from artiboost_tpu.datasets.hoquery import Queries, SynthQueries
from artiboost_tpu.mano import mano_forward, synthetic_mano_model

MANAGER_CFG = {
    "SYNTH_FACTOR": 0.6,
    "CONFIG_LEN_TRAIN": 64,
    "OBJ_ENGINE": {"OBJ": ["a", "b", "c", "d"], "OBJ_ORIGIN_DATASET": "HO3D"},
    "VIEW_ENGINE": {"PERSP_U_BINS": 4, "PERSP_THETA_BINS": 6,
                    "CAMERA_Z_RANGE": [0.45, 0.55]},
    "GRASP_ENGINE": {"GRASP_NUM": 10},
    "FILTER": {"BACK": True},
    "WEIGHT_UPDATE": {"LOWER": 0.1, "UPPER": 10.0},
    "UPDATE_METHOD": "method_1",
    "DIST_THRESHOLD": {"LOWER": 8.0, "UPPER": 16.0},
    "SCRAMBLER": {"TYPE": "random", "HAND_TSL_SIGMA": 0.01, "HAND_POSE_SIGMA": 0.1},
    "REFINER": {"TYPE": "null"},
    "RENDERER": {"RENDER_SIZE": [512, 512],
                 "CAM_PARAM": {"FX": 435.0, "FY": 435.0, "CX": 256.0, "CY": 256.0}},
    "DATA_PRESET": {"IMAGE_SIZE": [128, 128], "CENTER_IDX": 0, "CROP_MODEL": "root_obj"},
}


@pytest.fixture(scope="module")
def mano_model():
    return synthetic_mano_model()


class TestViewEngine:
    def test_persp_rotmats_orthonormal(self, key):
        cfg = ViewEngineConfig(4, 6)
        R = np.asarray(persp_rotmat_centers(cfg))
        assert R.shape == (24, 3, 3)
        eye = np.einsum("bij,bkj->bik", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (24, 1, 1)), atol=1e-5)

    def test_sample_view_ranges(self, key):
        cfg = ViewEngineConfig(4, 6, 0.45, 0.55)
        persp, cam_free, z = sample_view(cfg, jnp.arange(24), key)
        z = np.asarray(z)
        assert np.all(z[:, 2] >= 0.45) and np.all(z[:, 2] <= 0.55)
        np.testing.assert_allclose(z[:, :2], 0.0, atol=1e-7)
        # cam_free is a pure z-rotation
        cf = np.asarray(cam_free)
        np.testing.assert_allclose(cf[:, 2, 2], 1.0, atol=1e-6)

    def test_view_ids_cover_distinct_directions(self, key):
        cfg = ViewEngineConfig(4, 6)
        R = np.asarray(persp_rotmat_centers(cfg))
        dirs = R @ np.array([0, 0, 1.0])
        # pairwise distinct
        d = np.linalg.norm(dirs[:, None] - dirs[None], axis=-1)
        np.fill_diagonal(d, 1.0)
        assert d.min() > 1e-3


class TestCCV:
    def test_flat_roundtrip(self):
        o, v, g = flat_to_ovg(jnp.asarray([0, 59, 123]), 6, 10)
        back = ovg_to_flat(o, v, g, 6, 10)
        np.testing.assert_array_equal(np.asarray(back), [0, 59, 123])

    def test_sampling_respects_weights(self, key):
        space = init_ccv_space(2, 3, 4)
        # zero out everything except one triplet
        w = jnp.zeros((2, 3, 4)).at[1, 2, 3].set(1.0)
        space = space._replace(sample_weight_map=w)
        oid, vid, gid, occ = sample_triplets(space, key, 32)
        assert np.all(np.asarray(oid) == 1)
        assert np.all(np.asarray(vid) == 2)
        assert np.all(np.asarray(gid) == 3)
        assert int(occ[1, 2, 3]) == 32

    def test_sampling_excludes_blacklist(self, key):
        space = init_ccv_space(2, 3, 4)
        bl = jnp.zeros((2, 3, 4)).at[0].set(1.0)  # blacklist all of obj 0
        space = space._replace(blacklist_map=bl)
        oid, _, _, _ = sample_triplets(space, key, 64)
        assert np.all(np.asarray(oid) == 1)

    def test_sample_without_replacement_unique(self, key):
        space = init_ccv_space(2, 3, 4)
        oid, vid, gid, _ = sample_triplets(space, key, 24, replace=False)
        flat = np.asarray(ovg_to_flat(oid, vid, gid, 3, 4))
        assert len(np.unique(flat)) == 24

    def test_blacklist_map(self, mano_model, key):
        grasp_lib = synthetic_grasp_library(2, 6)
        cfg = ViewEngineConfig(4, 6)
        bl = build_blacklist_map(mano_model, grasp_lib.hand_pose,
                                 persp_rotmat_centers(cfg))
        assert bl.shape == (2, 24, 6)
        frac = float(jnp.mean(bl))
        assert 0.0 <= frac < 0.9  # some but not all filtered


class TestScramblers:
    @pytest.mark.parametrize("kind", ["naive", "random", "random_2", "random_3"])
    def test_scrambler_output_shapes(self, kind, mano_model, key, rng):
        B = 4
        pose = jnp.asarray(rng.randn(B, 48).astype(np.float32) * 0.2)
        tsl = jnp.asarray(rng.randn(B, 3).astype(np.float32) * 0.05)
        out = mano_forward(mano_model, pose, jnp.zeros((B, 10)))
        feed = {"hand_pose": pose, "hand_tsl": tsl, "joints": out.joints,
                "hand_verts": out.verts, "hand_transf": out.transforms_abs}
        fn = build_scrambler({"TYPE": kind, "HAND_TSL_SIGMA": 0.01, "HAND_POSE_SIGMA": 0.1})
        res = fn(key, feed)
        assert res["hand_pose"].shape == (B, 48)
        assert res["hand_tsl"].shape == (B, 3)
        assert np.all(np.isfinite(np.asarray(res["hand_pose"])))
        # perturbation is bounded
        assert float(jnp.abs(res["hand_tsl"] - tsl).max()) < 0.1

    def test_naive_keeps_pose(self, mano_model, key, rng):
        pose = jnp.asarray(rng.randn(2, 48).astype(np.float32) * 0.2)
        fn = SCRAMBLER_REGISTRY["naive"]
        res = fn(key, {"hand_pose": pose, "hand_tsl": jnp.zeros((2, 3))}, 0.01, 0.1)
        np.testing.assert_allclose(np.asarray(res["hand_pose"]), np.asarray(pose))


class TestRefiner:
    def test_null_refiner_fk(self, mano_model, rng):
        refine = build_refiner({"TYPE": "null"}, mano_model)
        pose = jnp.asarray(rng.randn(2, 48).astype(np.float32) * 0.2)
        tsl = jnp.asarray(rng.randn(2, 3).astype(np.float32) * 0.1)
        out = refine({"hand_pose": pose, "hand_tsl": tsl,
                      "hand_shape": jnp.zeros((2, 10))})
        ref = mano_forward(mano_model, pose, jnp.zeros((2, 10)))
        np.testing.assert_allclose(
            np.asarray(out["hand_verts"]), np.asarray(ref.verts + tsl[:, None]), atol=1e-5)

    def test_ho_refiner_runs(self, mano_model, rng, key):
        refine = build_refiner({"TYPE": "hand_obj", "ITERS": 2}, mano_model)
        pose = jnp.asarray(rng.randn(2, 48).astype(np.float32) * 0.2)
        tsl = jnp.asarray(rng.randn(2, 3).astype(np.float32) * 0.05)
        obj = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32) * 0.05)
        out = refine({"hand_pose": pose, "hand_tsl": tsl,
                      "hand_shape": jnp.zeros((2, 10))}, obj, jnp.ones((2, 256)))
        assert out["hand_verts"].shape == (2, 778, 3)
        assert np.all(np.isfinite(np.asarray(out["hand_verts"])))


class TestMining:
    def _setup(self):
        w = jnp.ones((2, 3, 4))
        val = jnp.zeros((2, 3, 4)).at[0, 0, 0].set(20.0).at[0, 0, 1].set(5.0)
        seen = jnp.zeros((2, 3, 4), bool).at[0, 0, 0].set(True).at[0, 0, 1].set(True)
        return w, val, seen

    def test_method_1_hard_up_easy_down(self):
        w, val, seen = self._setup()
        out = UPDATE_METHODS["method_1"](w, val, seen, 0.1, 10.0)
        new = np.asarray(out["sample_weight_map"])
        assert new[0, 0, 0] > 1.0  # hard (20mm) upweighted
        assert new[0, 0, 1] < 1.0  # easy (5mm) downweighted
        assert new[1, 1, 1] == 1.0  # unseen untouched

    def test_method_2_incremental(self):
        w, val, seen = self._setup()
        out = UPDATE_METHODS["method_2"](w, val, seen, 0.1, 10.0)
        new = np.asarray(out["sample_weight_map"])
        np.testing.assert_allclose(new[0, 0, 0], 1.1)
        np.testing.assert_allclose(new[0, 0, 1], 0.9)

    def test_method_3_deactivation(self):
        w, val, seen = self._setup()
        out = UPDATE_METHODS["method_3"](w, val, seen, 0.1, 10.0,
                                         dist_lower_threshold=8.0,
                                         dist_upper_threshold=16.0)
        new = np.asarray(out["sample_weight_map"])
        assert new[0, 0, 1] == 0.0   # solved -> deactivated
        assert new[0, 0, 0] == 1.0   # very hard -> reset to 1
        assert 0 < out["dist_lower_ratio"] < 1

    def test_method_4_switches(self):
        w, val, seen = self._setup()
        early = UPDATE_METHODS["method_4"](w, val, seen, 0.1, 10.0,
                                           epoch_idx=10, n_epochs=100)
        late = UPDATE_METHODS["method_4"](w, val, seen, 0.1, 10.0,
                                          epoch_idx=90, n_epochs=100)
        assert float(early["dist_lower_ratio"]) == -1.0
        assert float(late["dist_lower_ratio"]) != -1.0

    def test_uniform_is_noop(self):
        """The mining-A/B control arm (script/mining_ab.py) must leave the
        weight map bit-identical — any drift would contaminate the A/B."""
        w, val, seen = self._setup()
        out = UPDATE_METHODS["uniform"](w, val, seen, 0.1, 10.0)
        np.testing.assert_array_equal(np.asarray(out["sample_weight_map"]),
                                      np.asarray(w))


class TestPoseGeneratorPipeline:
    def test_generate_and_decode(self, mano_model, key, rng):
        obj_lib = synthetic_object_library(["a", "b"], v_max=256, f_max=512)
        grasp_lib = synthetic_grasp_library(2, 5)
        view_cfg = ViewEngineConfig(4, 6)
        scrambler = build_scrambler({"TYPE": "naive", "HAND_TSL_SIGMA": 0.01,
                                     "HAND_POSE_SIGMA": 0.1})
        refiner = build_refiner({"TYPE": "null"}, mano_model)
        gen_fn = make_pose_generator(mano_model, obj_lib, grasp_lib, view_cfg,
                                     scrambler, refiner)
        B = 8
        oid = jnp.asarray(rng.randint(0, 2, B))
        vid = jnp.asarray(rng.randint(0, 24, B))
        gid = jnp.asarray(rng.randint(0, 5, B))
        gen = gen_fn(key, oid, vid, gid)
        assert gen.obj_pose.shape == (B, 4, 4)
        # object must be in front of the camera at roughly z_offset
        tz = np.asarray(gen.obj_pose[:, 2, 3])
        assert np.all(tz > 0.2) and np.all(tz < 0.9)
        hand = decode_final_hand(mano_model, gen, jnp.arange(B))
        assert hand["hand_verts"].shape == (B, 778, 3)
        # hand near the object (both visible in camera)
        hz = np.asarray(hand["joints"][..., 2])
        assert np.all(hz > 0.1) and np.all(hz < 1.2)


class TestArtiBoostLoader:
    @pytest.fixture(scope="class")
    def loader(self):
        return ArtiBoostLoader(real_dataset=None, cfg=MANAGER_CFG, batch_size=8,
                               n_epochs=10)

    def test_prepare_and_iterate(self, loader):
        loader.prepare()
        assert loader.generated is not None
        batch = next(iter(loader))
        img = np.asarray(batch[Queries.IMAGE])
        assert img.shape == (8, 128, 128, 3)
        assert np.all(np.isfinite(img))
        assert np.asarray(batch[SynthQueries.IS_SYNTH]).all()
        assert batch[Queries.JOINTS_3D].shape == (8, 21, 3)
        # image actually contains rendered content (not all background)
        assert img.std() > 0.01

    def test_synth_batch_mano_annotations(self, loader):
        """Synth batches carry HAND_POSE/HAND_SHAPE/OBJ_VERTS_3D so the
        mixed-batch key intersection stops dropping real-data supervision
        (VERDICT r2 item 6). The emitted pose must be EXACT: MANO FK of it
        reproduces the root-relative joints the batch supervises with."""
        loader.prepare()
        batch = next(iter(loader))
        assert batch[Queries.HAND_POSE].shape == (8, 48)
        assert batch[Queries.HAND_SHAPE].shape == (8, 10)

        out = mano_forward(loader.mano_model, batch[Queries.HAND_POSE],
                           batch[Queries.HAND_SHAPE])
        fk_rel = np.asarray(out.joints - out.joints[:, :1])
        targ_rel = np.asarray(batch[Queries.JOINTS_3D]
                              - batch[Queries.JOINTS_3D][:, :1])
        np.testing.assert_allclose(fk_rel, targ_rel, atol=2e-5)

        # OBJ_VERTS_3D consistent with OBJ_TRANSF over OBJ_VERTS_CAN
        tr = np.asarray(batch[Queries.OBJ_TRANSF])
        can = np.asarray(batch[Queries.OBJ_VERTS_CAN])
        root = np.asarray(batch[Queries.ROOT_JOINT])[:, None]
        want = np.einsum("bij,bnj->bni", tr[:, :3, :3], can) + tr[:, None, :3, 3] - root
        np.testing.assert_allclose(
            np.asarray(batch[Queries.OBJ_VERTS_3D]), want, atol=1e-5)

        # a mixed batch keeps the MANO/object supervision keys, and the
        # Reg-model losses reading them stay finite + nonzero
        real_like = {k: v for k, v in batch.items()}  # schema superset stand-in
        keys = set(real_like) & set(batch)
        for k in (Queries.HAND_POSE, Queries.HAND_SHAPE, Queries.OBJ_VERTS_3D,
                  Queries.HAND_VERTS_3D):
            assert k in keys
        from artiboost_tpu.criterions.honetloss import ManoLoss, ObjLoss

        preds = {
            "mano_shape": batch[Queries.HAND_SHAPE] + 0.1,
            "mano_pca_pose": batch[Queries.HAND_POSE] + 0.1,
            "joints_3d_abs": batch[Queries.JOINTS_3D]
            + batch[Queries.ROOT_JOINT][:, None] + 0.01,
            "hand_verts_3d_abs": batch[Queries.HAND_VERTS_3D]
            + batch[Queries.ROOT_JOINT][:, None] + 0.01,
            "box_rot_rotmat": batch[Queries.OBJ_TRANSF][:, :3, :3],
            "boxroot_3d_abs": batch[Queries.OBJ_TRANSF][:, :3, 3] + 0.01,
        }
        mano_loss, _ = ManoLoss(LAMBDA_JOINTS_3D=1.0, LAMBDA_HAND_VERTS_3D=1.0,
                                LAMBDA_SHAPE_REG=1.0, LAMBDA_POSE_REG=1.0)(
            preds, batch)
        obj_loss, _ = ObjLoss(LAMBDA_OBJ_VERTS_3D=1.0)(preds, batch)
        assert np.isfinite(float(mano_loss)) and float(mano_loss) > 0
        assert np.isfinite(float(obj_loss)) and float(obj_loss) > 0

    def test_reweight_changes_map(self, loader):
        loader.prepare()
        val = jnp.full(loader.ccv.shape, 5.0).at[0, 0, 0].set(30.0)
        seen = jnp.zeros(loader.ccv.shape, bool).at[0, 0, 0].set(True).at[0, 0, 1].set(True)
        before = np.asarray(loader.ccv.sample_weight_map).copy()
        loader.sample_reweight(val, seen, epoch_idx=0)
        after = np.asarray(loader.ccv.sample_weight_map)
        assert after[0, 0, 0] > before[0, 0, 0]
        assert after[0, 0, 1] < before[0, 0, 1]

    def test_state_roundtrip(self, loader):
        state = loader.state_dict()
        loader.load_state_dict(state)
        np.testing.assert_allclose(
            np.asarray(loader.ccv.sample_weight_map), state["sample_weight_map"])

    def test_synth_shutdown(self):
        loader = ArtiBoostLoader(real_dataset=None, cfg=MANAGER_CFG, batch_size=4,
                                 n_epochs=10)
        loader.prepare()
        loader.synth_shutdown()
        assert not loader.use_synth
        assert loader.generated is None


class TestValSweep:
    """Dedicated val-mode CCV sweep (ovg_set.py:104-132 parity): uniform
    non-blacklisted draw WITHOUT replacement, sized VAL_LEN, rendered as
    pure synth batches for the mining evaluator."""

    def _loader(self, **over):
        cfg = dict(MANAGER_CFG)
        cfg.update({"VAL_LEN": 32, "VAL_START_EPOCH": 2, "VAL_FREQ": 2})
        cfg.update(over)
        return ArtiBoostLoader(real_dataset=None, cfg=cfg, batch_size=8,
                               n_epochs=10)

    def test_prepare_val_unique_and_unblacklisted(self):
        loader = self._loader()
        loader.prepare_val()
        gen = loader.generated_val
        assert gen.obj_id.shape[0] == 32  # multiple of batch_size
        O, V, G = loader.ccv.shape
        flat = (np.asarray(gen.obj_id) * V + np.asarray(gen.persp_id)) * G \
            + np.asarray(gen.grasp_id)
        assert len(set(flat.tolist())) == 32  # without replacement
        bl = np.asarray(loader.ccv.blacklist_map)
        assert not bl[np.asarray(gen.obj_id), np.asarray(gen.persp_id),
                      np.asarray(gen.grasp_id)].any()

    def test_val_len_clamped_to_space(self):
        loader = self._loader(VAL_LEN=10_000)  # space is 4*24*10=960 minus blacklist
        loader.prepare_val()
        O, V, G = loader.ccv.shape
        n_valid = O * V * G - int(np.asarray(loader.ccv.blacklist_map).sum())
        assert loader.generated_val.obj_id.shape[0] <= n_valid

    def test_iter_val_batches(self):
        loader = self._loader()
        loader.prepare_val()
        batches = list(loader.iter_val())
        assert len(batches) == loader.len_val() == 4
        b = batches[0]
        assert np.asarray(b[SynthQueries.IS_SYNTH]).all()
        assert b[Queries.IMAGE].shape[0] == 8

    def test_should_val_gates(self):
        loader = self._loader()
        # VAL_START_EPOCH=2, VAL_FREQ=2: epochs 1,3,5,... AND epoch+1>=2
        assert not loader.should_val(0)
        assert loader.should_val(1)
        assert not loader.should_val(2)
        assert loader.should_val(3)
        loader.synth_shutdown()
        assert not loader.should_val(3)

    def test_no_val_len_no_sweep(self):
        loader = ArtiBoostLoader(real_dataset=None, cfg=MANAGER_CFG,
                                 batch_size=8, n_epochs=10)
        assert not loader.should_val(1)


class TestChunkedPrepare:
    """The epoch pose sweep streams in OPG_BATCH_SIZE chunks (reference
    --opg_batch_size parity) so real-scale epochs (40k-100k triplets)
    bound HBM instead of one giant jit."""

    def test_chunked_matches_requested_length(self):
        cfg = dict(MANAGER_CFG)
        cfg["CONFIG_LEN_TRAIN"] = 40   # not a multiple of the chunk
        cfg["OPG_BATCH_SIZE"] = 16
        loader = ArtiBoostLoader(real_dataset=None, cfg=cfg, batch_size=8)
        loader.prepare()
        assert loader.generated.obj_id.shape[0] == 40
        assert loader.generated.obj_pose.shape == (40, 4, 4)
        assert np.isfinite(np.asarray(loader.generated.hand_tsl)).all()

    def test_chunked_on_mesh(self):
        from artiboost_tpu.parallel.mesh import get_mesh

        mesh = get_mesh(n_data=8)
        cfg = dict(MANAGER_CFG)
        cfg["CONFIG_LEN_TRAIN"] = 24
        cfg["OPG_BATCH_SIZE"] = 10   # rounds up to 16 (2 per chip)
        loader = ArtiBoostLoader(real_dataset=None, cfg=cfg, batch_size=8,
                                 mesh=mesh)
        loader.prepare()
        assert loader.generated.obj_id.shape[0] == 24
        batch = next(iter(loader))
        assert batch["image"].shape[0] == 8


class TestSynthShutdownRatio:
    """Config-gated early shutdown (VERDICT r4 item 5): when method_3/4's
    dist_lower_ratio crosses SYNTH_SHUTDOWN_RATIO, synthesis shuts down
    and training continues real-only (the reference method_3 docstring's
    early-shutdown semantics, artiboost_loader.py:548-569)."""

    class _FakeReal:
        def __len__(self):
            return 16

    def _loader(self, ratio, with_real=True):
        cfg = dict(MANAGER_CFG)
        cfg.update({"UPDATE_METHOD": "method_3",
                    "SYNTH_SHUTDOWN_RATIO": ratio,
                    "DIST_THRESHOLD": {"LOWER": 8.0, "UPPER": 16.0}})
        loader = ArtiBoostLoader(real_dataset=None, cfg=cfg, batch_size=4,
                                 n_epochs=10)
        if with_real:
            loader.real_dataset = self._FakeReal()
        return loader

    def _maps(self, loader, solved_frac):
        shape = loader.ccv.shape
        n = int(np.prod(shape))
        vals = np.full(n, 100.0, np.float32)  # unsolved: 100mm
        vals[: int(round(solved_frac * n))] = 2.0  # solved: < 8mm
        seen = np.ones(n, bool)
        return (jnp.asarray(vals.reshape(shape)),
                jnp.asarray(seen.reshape(shape)))

    def test_crossing_threshold_shuts_down(self):
        loader = self._loader(0.5)
        val_map, seen = self._maps(loader, solved_frac=0.6)
        loader.sample_reweight(val_map, seen, epoch_idx=3)
        assert loader.last_dist_lower_ratio == pytest.approx(0.6, abs=0.01)
        assert not loader.use_synth

    def test_below_threshold_keeps_synth(self):
        loader = self._loader(0.5)
        val_map, seen = self._maps(loader, solved_frac=0.3)
        loader.sample_reweight(val_map, seen, epoch_idx=3)
        assert loader.use_synth

    def test_no_real_dataset_never_shuts_down(self):
        loader = self._loader(0.5, with_real=False)
        val_map, seen = self._maps(loader, solved_frac=0.9)
        loader.sample_reweight(val_map, seen, epoch_idx=3)
        assert loader.use_synth  # nothing to fall back on

    def test_unarmed_by_default(self):
        loader = self._loader(0.0)
        val_map, seen = self._maps(loader, solved_frac=1.0)
        loader.sample_reweight(val_map, seen, epoch_idx=3)
        assert loader.use_synth
        assert loader.last_dist_lower_ratio == pytest.approx(1.0)

    def test_method3_deactivates_solved_triplets(self):
        """Solved triplets get weight 0 and the sampler provably avoids
        them (method_3 end-to-end semantics)."""
        from artiboost_tpu.artiboost.ccv import sample_triplets

        loader = self._loader(0.0)
        val_map, seen = self._maps(loader, solved_frac=0.5)
        loader.sample_reweight(val_map, seen, epoch_idx=3)
        w = np.asarray(loader.ccv.sample_weight_map).reshape(-1)
        n_solved = int(0.5 * w.size)
        np.testing.assert_array_equal(w[:n_solved], 0.0)
        assert (w[n_solved:] > 0).any()
        oid, vid, gid, _ = sample_triplets(loader.ccv, jax.random.PRNGKey(0),
                                           512, replace=True)
        O, V, G = loader.ccv.shape
        flat = (np.asarray(oid) * V + np.asarray(vid)) * G + np.asarray(gid)
        assert (flat >= n_solved).all(), "sampler drew a deactivated triplet"
