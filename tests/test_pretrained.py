"""Released-checkpoint loading (utils/pretrained.py): an ARCH.PRETRAINED
``.pth.tar`` with the reference's state-dict naming must convert and land
on the initialized Arch train state, and BACKBONE.PRETRAINED must pick up
local ImageNet weights (warn-and-scratch when absent). Guards VERDICT r1
items 2 and 4: the eval CLI's dead-config ``.pth.tar`` path and the
silent-no-op ImageNet init.
"""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from artiboost_tpu.datasets.hoquery import Queries  # noqa: E402
from artiboost_tpu.models import build_arch  # noqa: E402
from artiboost_tpu.parallel import build_optimizer, create_train_state  # noqa: E402
from artiboost_tpu.utils.pretrained import load_arch_pretrained  # noqa: E402
from artiboost_tpu.utils.torch_convert import conv_kernel, linear_kernel  # noqa: E402


def _torch_basic_block(cin, cout, stride):
    class Block(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(cout)
            self.conv2 = torch.nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = torch.nn.BatchNorm2d(cout)
            if stride != 1 or cin != cout:
                self.downsample = torch.nn.Sequential(
                    torch.nn.Conv2d(cin, cout, 1, stride, bias=False),
                    torch.nn.BatchNorm2d(cout))

    return Block()


class _TorchResNet18(torch.nn.Module):
    """Reference/torchvision state-dict naming, ResNet18 shapes."""

    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        widths = (64, 128, 256, 512)
        cin = 64
        for i, w in enumerate(widths):
            blocks = []
            for j in range(2):
                stride = 2 if (i > 0 and j == 0) else 1
                blocks.append(_torch_basic_block(cin, w, stride))
                cin = w
            setattr(self, f"layer{i + 1}", torch.nn.Sequential(*blocks))


class _TorchHybridHead(torch.nn.Module):
    """IntegralDeconvHead layout at the smoke-config sizes
    (NUM_DECONV_FILTERS [128,128], NCLASSES 22, DEPTH 16)."""

    def __init__(self):
        super().__init__()
        self.deconv_layers = torch.nn.Sequential(
            torch.nn.ConvTranspose2d(512, 128, 4, 2, 1, bias=False),
            torch.nn.BatchNorm2d(128), torch.nn.ReLU(),
            torch.nn.ConvTranspose2d(128, 128, 4, 2, 1, bias=False),
            torch.nn.BatchNorm2d(128), torch.nn.ReLU())
        self.final_layer = torch.nn.Conv2d(128, 22 * 16, 1)


class _TorchBoxHead(torch.nn.Module):
    """MLP_O LAYERS_N [512, 128] OUT 6 (anakin/models/mlp.py)."""

    def __init__(self):
        super().__init__()
        self.layers = torch.nn.Sequential(
            torch.nn.Linear(512, 128), torch.nn.ReLU(),
            torch.nn.Linear(128, 6))


def _hybrid_state_dict():
    sd = {}
    for prefix, mod in (("backbone.", _TorchResNet18()),
                        ("hybrid_head.", _TorchHybridHead()),
                        ("box_head.", _TorchBoxHead())):
        with torch.no_grad():
            for m in mod.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.uniform_(-0.3, 0.3)
                    m.running_var.uniform_(0.5, 1.5)
        sd.update({prefix + k: v for k, v in mod.state_dict().items()
                   if "num_batches_tracked" not in k})
    return sd


def _smoke_arch_cfg():
    return {
        "TYPE": "HybridBaseline",
        "PRETRAINED": "",
        "BACKBONE": {"TYPE": "ResNet18", "PRETRAINED": False},
        "HYBRID_HEAD": {
            "TYPE": "IntegralDeconvHead", "NCLASSES": 22,
            "DECONV_WITH_BIAS": False, "NORM_TYPE": "softmax",
            "INPUT_CHANNEL": 512, "DEPTH_RESOLUTION": 16,
            "NUM_DECONV_LAYERS": 2, "NUM_DECONV_FILTERS": [128, 128],
            "NUM_DECONV_KERNELS": [4, 4], "FINAL_CONV_KERNEL": 1,
        },
        "BOX_HEAD": {"TYPE": "MLP_O", "LAYERS_N": [512, 128],
                     "OUT_CHANNEL": 6},
        "PREVIOUS": [],
    }


def _init_state(arch_cfg):
    preset = {"IMAGE_SIZE": [64, 64], "HEATMAP_SIZE": [8, 8],
              "CENTER_IDX": 9}
    arch = build_arch(arch_cfg, preset)
    rng = np.random.RandomState(0)
    batch = {
        Queries.IMAGE: jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32)),
        Queries.ROOT_JOINT: jnp.asarray(
            np.tile([0, 0, 0.5], (2, 1)).astype(np.float32)),
        Queries.CAM_INTR: jnp.asarray(np.tile(
            np.array([[120.0, 0, 32], [0, 120.0, 32], [0, 0, 1]], np.float32),
            (2, 1, 1))),
        Queries.CORNERS_CAN: jnp.asarray(
            rng.randn(2, 8, 3).astype(np.float32) * 0.05),
    }
    optimizer, _ = build_optimizer({"LR": 1e-4})
    return create_train_state(arch, optimizer, batch, jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def hybrid_state():
    return _init_state(_smoke_arch_cfg())


def test_pth_tar_loads_into_arch_state(hybrid_state, tmp_path):
    """End-to-end: a reference-named .pth.tar converts, tiles exactly onto
    the initialized HybridBaseline tree, and its leaves land."""
    sd = _hybrid_state_dict()
    ckpt = tmp_path / "release.pth.tar"
    torch.save({"state_dict": {k: torch.as_tensor(v) for k, v in sd.items()}},
               str(ckpt))

    cfg = _smoke_arch_cfg()
    cfg["PRETRAINED"] = str(ckpt)
    new_state, loaded = load_arch_pretrained(hybrid_state, cfg)
    assert loaded

    p = new_state.params["model_list_0"]
    s = new_state.batch_stats["model_list_0"]
    np.testing.assert_allclose(
        np.asarray(p["backbone"]["conv1"]["kernel"]),
        conv_kernel(sd["backbone.conv1.weight"].numpy()), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s["backbone"]["bn1"]["mean"]),
        sd["backbone.bn1.running_mean"].numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p["box_head"]["Dense_0"]["kernel"]),
        linear_kernel(sd["box_head.layers.0.weight"].numpy()), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p["hybrid_head"]["Conv_0"]["bias"]),
        sd["hybrid_head.final_layer.bias"].numpy(), rtol=1e-6)


def test_pth_tar_shape_mismatch_raises(hybrid_state, tmp_path):
    sd = _hybrid_state_dict()
    sd["backbone.conv1.weight"] = torch.zeros(64, 3, 5, 5)  # wrong k
    ckpt = tmp_path / "bad.pth.tar"
    torch.save({"state_dict": {k: torch.as_tensor(v) for k, v in sd.items()}},
               str(ckpt))
    cfg = _smoke_arch_cfg()
    cfg["PRETRAINED"] = str(ckpt)
    with pytest.raises(ValueError, match="shape"):
        load_arch_pretrained(hybrid_state, cfg)


def test_imagenet_backbone_init(hybrid_state, tmp_path, monkeypatch):
    """BACKBONE.PRETRAINED: true finds local torchvision weights and loads
    ONLY the backbone."""
    tv = _TorchResNet18()
    with torch.no_grad():
        for m in tv.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
    sd = {k: v for k, v in tv.state_dict().items()
          if "num_batches_tracked" not in k}
    wdir = tmp_path / "checkpoints" / "imagenet"
    os.makedirs(wdir)
    torch.save(sd, str(wdir / "resnet18-imagenet.pth"))
    monkeypatch.chdir(tmp_path)

    cfg = _smoke_arch_cfg()
    cfg["BACKBONE"]["PRETRAINED"] = True
    old_box = np.asarray(
        hybrid_state.params["model_list_0"]["box_head"]["Dense_0"]["kernel"])
    new_state, loaded = load_arch_pretrained(hybrid_state, cfg)
    assert loaded
    p = new_state.params["model_list_0"]
    np.testing.assert_allclose(
        np.asarray(p["backbone"]["conv1"]["kernel"]),
        conv_kernel(sd["conv1.weight"].numpy()), rtol=1e-6)
    # box head untouched
    np.testing.assert_allclose(
        np.asarray(p["box_head"]["Dense_0"]["kernel"]), old_box, rtol=1e-7)


def test_simple_baseline_pth_tar_loads(tmp_path):
    """SimpleBaseline (``anakin/models/simplebaseline.py:194-241``:
    ``backbone.*`` + ``pose_head.*``) has a converter table entry —
    VERDICT r2 item 8."""

    class _TorchPoseHead(torch.nn.Module):
        # IntegralDeconvHead at NCLASSES=29 (21 joints + 8 corners)
        def __init__(self):
            super().__init__()
            self.deconv_layers = torch.nn.Sequential(
                torch.nn.ConvTranspose2d(512, 128, 4, 2, 1, bias=False),
                torch.nn.BatchNorm2d(128), torch.nn.ReLU(),
                torch.nn.ConvTranspose2d(128, 128, 4, 2, 1, bias=False),
                torch.nn.BatchNorm2d(128), torch.nn.ReLU())
            self.final_layer = torch.nn.Conv2d(128, 29 * 16, 1)

    sd = {}
    for prefix, mod in (("backbone.", _TorchResNet18()),
                        ("pose_head.", _TorchPoseHead())):
        with torch.no_grad():
            for m in mod.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.uniform_(-0.3, 0.3)
                    m.running_var.uniform_(0.5, 1.5)
        sd.update({prefix + k: v for k, v in mod.state_dict().items()
                   if "num_batches_tracked" not in k})
    ckpt = tmp_path / "simple.pth.tar"
    torch.save({"state_dict": {k: torch.as_tensor(v) for k, v in sd.items()}},
               str(ckpt))

    cfg = {
        "TYPE": "SimpleBaseline",
        "PRETRAINED": str(ckpt),
        "BACKBONE": {"TYPE": "ResNet18", "PRETRAINED": False},
        "HEAD": {
            "TYPE": "IntegralDeconvHead", "NCLASSES": 29,
            "DECONV_WITH_BIAS": False, "NORM_TYPE": "softmax",
            "INPUT_CHANNEL": 512, "DEPTH_RESOLUTION": 16,
            "NUM_DECONV_LAYERS": 2, "NUM_DECONV_FILTERS": [128, 128],
            "NUM_DECONV_KERNELS": [4, 4], "FINAL_CONV_KERNEL": 1,
        },
        "PREVIOUS": [],
    }
    state = _init_state(cfg)
    new_state, loaded = load_arch_pretrained(state, cfg)
    assert loaded
    p = new_state.params["model_list_0"]
    s = new_state.batch_stats["model_list_0"]
    np.testing.assert_allclose(
        np.asarray(p["backbone"]["conv1"]["kernel"]),
        conv_kernel(sd["backbone.conv1.weight"].numpy()), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p["pose_head"]["Conv_0"]["bias"]),
        sd["pose_head.final_layer.bias"].numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s["pose_head"]["BatchNorm_1"]["mean"]),
        sd["pose_head.deconv_layers.4.running_mean"].numpy(), rtol=1e-6)


def test_imagenet_missing_warns_and_keeps_scratch(hybrid_state, tmp_path,
                                                  monkeypatch):
    monkeypatch.chdir(tmp_path)  # nothing on disk here
    cfg = _smoke_arch_cfg()
    cfg["BACKBONE"]["PRETRAINED"] = True
    new_state, loaded = load_arch_pretrained(hybrid_state, cfg)
    assert not loaded
    assert new_state is hybrid_state
