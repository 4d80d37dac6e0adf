import os
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from artiboost_tpu.datasets.hoquery import Queries
from artiboost_tpu.models import build_arch
from artiboost_tpu.models.integral_head import IntegralDeconvHead, integral_heatmap3d
from artiboost_tpu.models.resnet import ResNet34 as resnet34_factory


HYBRID_ARCH_CFG = {
    "TYPE": "HybridBaseline",
    "PRETRAINED": "",
    "BACKBONE": {"TYPE": "ResNet34", "PRETRAINED": False, "FREEZE_BATCHNORM": False},
    "HYBRID_HEAD": {
        "TYPE": "IntegralDeconvHead",
        "NCLASSES": 22,
        "DECONV_WITH_BIAS": False,
        "NORM_TYPE": "softmax",
        "INPUT_CHANNEL": 512,
        "DEPTH_RESOLUTION": 28,
        "NUM_DECONV_LAYERS": 2,
        "NUM_DECONV_FILTERS": [256, 256],
        "NUM_DECONV_KERNELS": [4, 4],
        "FINAL_CONV_KERNEL": 1,
    },
    "BOX_HEAD": {"TYPE": "MLP_O", "LAYERS_N": [512, 256, 128], "OUT_CHANNEL": 6},
    "PREVIOUS": [],
}

DATA_PRESET = {
    "IMAGE_SIZE": [224, 224],
    "HEATMAP_SIZE": [28, 28],
    "CENTER_IDX": 0,
}


def _dummy_inputs(rng, B=2, res=224):
    intr = np.tile(np.array([[435.0, 0, 112], [0, 435.0, 112], [0, 0, 1]], np.float32), (B, 1, 1))
    return {
        Queries.IMAGE: jnp.asarray(rng.rand(B, res, res, 3).astype(np.float32)),
        Queries.ROOT_JOINT: jnp.asarray(np.tile([0.0, 0.0, 0.5], (B, 1)).astype(np.float32)),
        Queries.CAM_INTR: jnp.asarray(intr),
        Queries.CORNERS_CAN: jnp.asarray(rng.randn(B, 8, 3).astype(np.float32) * 0.05),
    }


class TestResNet:
    def test_feature_pyramid_shapes(self, rng, key):
        net = resnet34_factory(PRETRAINED=False)
        x = jnp.asarray(rng.rand(1, 224, 224, 3).astype(np.float32))
        variables = net.init(key, x, train=False)
        feats = net.apply(variables, x, train=False)
        assert feats["res_layer1"].shape == (1, 56, 56, 64)
        assert feats["res_layer2"].shape == (1, 28, 28, 128)
        assert feats["res_layer3"].shape == (1, 14, 14, 256)
        assert feats["res_layer4"].shape == (1, 7, 7, 512)
        assert feats["res_layer4_mean"].shape == (1, 512)

    def test_batchnorm_mutable_in_train(self, rng, key):
        net = resnet34_factory(PRETRAINED=False)
        x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
        variables = net.init(key, x, train=False)
        _, new_state = net.apply(variables, x, train=True, mutable=["batch_stats"])
        assert "batch_stats" in new_state


class TestIntegralHead:
    def test_integral_heatmap3d_peak(self):
        # delta heatmap at (d, v, u) = (3, 10, 20) of a 28^3 volume
        hm = np.zeros((1, 1, 28, 28, 28), np.float32)
        hm[0, 0, 3, 10, 20] = 1.0
        uvd = np.asarray(integral_heatmap3d(jnp.asarray(hm)))
        np.testing.assert_allclose(uvd[0, 0], [20 / 28, 10 / 28, 3 / 28], atol=1e-6)

    def test_head_output_range(self, rng, key):
        head = IntegralDeconvHead(nclasses=22, depth_res=28, heatmap_size=(28, 28))
        feat = jnp.asarray(rng.rand(2, 7, 7, 512).astype(np.float32))
        variables = head.init(key, feat, train=False)
        out = head.apply(variables, feat, train=False)
        assert out["kp3d"].shape == (2, 22, 3)
        assert out["kp3d_confd"].shape == (2, 22)
        assert np.all(np.asarray(out["kp3d"]) >= 0) and np.all(np.asarray(out["kp3d"]) <= 1)


class TestHybridBaseline:
    @pytest.fixture(scope="class")
    def arch_and_vars(self):
        arch = build_arch([HYBRID_ARCH_CFG], DATA_PRESET)
        rng = np.random.RandomState(0)
        inputs = _dummy_inputs(rng)
        variables = arch.init(jax.random.PRNGKey(0), inputs, train=False)
        return arch, variables

    def test_forward_shapes(self, arch_and_vars, rng):
        arch, variables = arch_and_vars
        out = arch.apply(variables, _dummy_inputs(rng), train=False)
        assert out["joints_3d_abs"].shape == (2, 21, 3)
        assert out["corners_3d_abs"].shape == (2, 8, 3)
        assert out["2d_uvd"].shape == (2, 30, 3)
        assert out["box_rot_rotmat"].shape == (2, 3, 3)

    def test_root_relative_consistency(self, arch_and_vars, rng):
        arch, variables = arch_and_vars
        out = arch.apply(variables, _dummy_inputs(rng), train=False)
        root = np.asarray(out["joints_3d_abs"])[:, DATA_PRESET["CENTER_IDX"]]
        np.testing.assert_allclose(
            np.asarray(out["joints_3d"]),
            np.asarray(out["joints_3d_abs"]) - root[:, None], atol=1e-6)

    def test_corners_follow_rotation(self, arch_and_vars, rng):
        arch, variables = arch_and_vars
        inputs = _dummy_inputs(rng)
        out = arch.apply(variables, inputs, train=False)
        R = np.asarray(out["box_rot_rotmat"])
        can = np.asarray(inputs[Queries.CORNERS_CAN])
        expect = np.einsum("bij,bnj->bni", R, can) + np.asarray(out["boxroot_3d_abs"])
        np.testing.assert_allclose(np.asarray(out["corners_3d_abs"]), expect, atol=1e-5)

    def test_jit_forward(self, arch_and_vars, rng):
        arch, variables = arch_and_vars
        fn = jax.jit(lambda v, i: arch.apply(v, i, train=False))
        out = fn(variables, _dummy_inputs(rng))
        assert np.all(np.isfinite(np.asarray(out["joints_3d_abs"])))


class TestRegModels:
    def test_hopregnet_forward(self, rng, key):
        cfg = {
            "TYPE": "HOPRegNet",
            "PRETRAINED": "",
            "BACKBONE": {"TYPE": "ResNet18", "PRETRAINED": False},
            "HEAD": {"TYPE": "ManoBranch", "INPUT_DIM": 512, "NCOMPS": 15,
                     "USE_PCA": True, "CENTER_IDX": 9, "MANO_ASSETS_ROOT": ""},
            "PREVIOUS": [],
        }
        arch = build_arch([cfg], DATA_PRESET)
        inputs = _dummy_inputs(rng)
        variables = arch.init(key, inputs, train=False)
        out = arch.apply(variables, inputs, train=False)
        assert out["joints_3d_abs"].shape == (2, 21, 3)
        assert out["hand_verts_3d_abs"].shape == (2, 778, 3)
        assert out["corners_3d_abs"].shape == (2, 8, 3)
        assert out["mano_full_pose"].shape == (2, 48)

    def test_honet_forward(self, rng, key):
        cfg = {
            "TYPE": "HoNet",
            "PRETRAINED": "",
            "BACKBONE": {"TYPE": "ResNet18", "PRETRAINED": False},
            "HEAD": {"TYPE": "ManoBranch", "INPUT_DIM": 512, "NCOMPS": 15,
                     "USE_PCA": True, "CENTER_IDX": 9, "MANO_ASSETS_ROOT": ""},
            "OBJ_TRANS_FACTOR": 100.0,
            "OBJ_SCALE_FACTOR": 0.0001,
            "PREVIOUS": [],
        }
        arch = build_arch([cfg], DATA_PRESET)
        inputs = _dummy_inputs(rng)
        variables = arch.init(key, inputs, train=False)
        out = arch.apply(variables, inputs, train=False)
        assert out["joints_3d_abs"].shape == (2, 21, 3)
        assert np.all(np.isfinite(np.asarray(out["corners_3d_abs"])))

    def test_honet_fhb_adaptor(self, rng, key):
        """MANO_FHB_ADAPTOR (honetMANO.py:44-53,144-155): joints are
        regressed from the MANO verts by a frozen 778->21 adaptor and
        both joints and verts are recentered at center_idx."""
        cfg = {
            "TYPE": "HoNet",
            "PRETRAINED": "",
            "BACKBONE": {"TYPE": "ResNet18", "PRETRAINED": False},
            "HEAD": {"TYPE": "ManoBranch", "INPUT_DIM": 512, "NCOMPS": 15,
                     "USE_PCA": True, "CENTER_IDX": 9, "MANO_ASSETS_ROOT": ""},
            "OBJ_TRANS_FACTOR": 100.0,
            "OBJ_SCALE_FACTOR": 0.0001,
            "MANO_FHB_ADAPTOR": True,
            "MANO_FHB_ADAPTOR_DIR": "does/not/exist",  # stand-in regressor
            "PREVIOUS": [],
        }
        arch = build_arch([cfg], DATA_PRESET)
        inputs = _dummy_inputs(rng)
        variables = arch.init(key, inputs, train=False)
        out = arch.apply(variables, inputs, train=False)
        # joints = adaptor @ verts, recentered: joint[center_idx] == root
        # (center_idx comes from DATA_PRESET, honetMANO.py:150)
        joints_c = np.asarray(out["joints_3d_abs"] - out["root_joint"][:, None])
        np.testing.assert_allclose(joints_c[:, DATA_PRESET["CENTER_IDX"]], 0.0,
                                   atol=1e-5)
        # the adaptor regressor is a frozen param; verts recentered too
        verts_c = np.asarray(out["hand_verts_3d_abs"] - out["root_joint"][:, None])
        reg = np.asarray(
            variables["params"]["model_list_0"]["adaptor"]["regressor"])
        np.testing.assert_allclose(
            np.einsum("jv,bvc->bjc", reg, verts_c), joints_c, atol=1e-4)


class TestDecayMask:
    """ADVICE r4: adamw weight decay must not erode the frozen ManoAdaptor
    regressor (the reference stores it with requires_grad=False)."""

    def test_regressor_not_decayed(self):
        import optax

        from artiboost_tpu.parallel.train_state import build_optimizer

        opt, _ = build_optimizer({"OPTIMIZER": "adam", "LR": 1e-2,
                                  "WEIGHT_DECAY": 0.1})
        params = {"adaptor": {"regressor": jnp.ones((4, 4))},
                  "dense": {"kernel": jnp.ones((4, 4))}}
        state = opt.init(params)
        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        updates, _ = opt.update(zero_grads, state, params)
        new = optax.apply_updates(params, updates)
        # frozen regressor: bitwise unchanged under zero grads
        np.testing.assert_array_equal(np.asarray(new["adaptor"]["regressor"]),
                                      np.asarray(params["adaptor"]["regressor"]))
        # ordinary params DO decay
        assert float(jnp.abs(new["dense"]["kernel"]
                             - params["dense"]["kernel"]).max()) > 0

    def test_regressor_name_unique_to_adaptor(self):
        """The decay mask keys off the literal leaf name 'regressor'; keep
        that name unique to ManoAdaptor in the model zoo."""
        import subprocess

        out = subprocess.run(
            ["grep", "-rn", "self.param(\"regressor\"", "artiboost_tpu/"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        files = {line.split(":")[0] for line in out.stdout.strip().splitlines()}
        assert files == {"artiboost_tpu/models/hpregnet.py"}, files
