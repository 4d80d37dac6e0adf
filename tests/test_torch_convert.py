"""Checkpoint conversion parity: torch layers (the reference's runtime)
vs flax layers with converted weights must agree numerically. Guards the
released-``.pth.tar``-to-flax path (``utils/torch_convert.py``), where a
silent layout mismatch (OIHW/HWIO, deconv flip, BN stats) would corrupt
eval parity without crashing.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import flax.linen as fnn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from artiboost_tpu.utils.torch_convert import (  # noqa: E402
    conv_kernel,
    convert_mlp,
    convert_resnet,
    deconv_kernel,
    linear_kernel,
)

TOL = dict(rtol=2e-4, atol=2e-4)


def _np(x):
    return x.detach().numpy()


def test_conv_parity():
    tconv = torch.nn.Conv2d(3, 8, 7, stride=2, padding=3, bias=False)
    x = torch.randn(2, 3, 16, 16)
    ref = _np(tconv(x)).transpose(0, 2, 3, 1)  # NCHW -> NHWC

    fconv = fnn.Conv(8, (7, 7), (2, 2), padding=3, use_bias=False)
    params = {"params": {"kernel": jnp.asarray(conv_kernel(_np(tconv.weight)))}}
    out = fconv.apply(params, jnp.asarray(_np(x).transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)


def test_deconv_parity():
    """torch ConvTranspose2d(k4, s2, p1) == flax ConvTranspose(k4, s2, SAME)
    with the converted kernel — the head's upsampling layer."""
    tdeconv = torch.nn.ConvTranspose2d(6, 4, 4, stride=2, padding=1, bias=False)
    x = torch.randn(2, 6, 7, 7)
    ref = _np(tdeconv(x)).transpose(0, 2, 3, 1)
    assert ref.shape == (2, 14, 14, 4)

    fdeconv = fnn.ConvTranspose(4, (4, 4), strides=(2, 2), padding="SAME",
                                use_bias=False)
    params = {"params": {"kernel": jnp.asarray(deconv_kernel(_np(tdeconv.weight)))}}
    out = fdeconv.apply(params, jnp.asarray(_np(x).transpose(0, 2, 3, 1)))
    assert out.shape == (2, 14, 14, 4)
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)


def test_linear_parity():
    tlin = torch.nn.Linear(10, 5)
    x = torch.randn(3, 10)
    ref = _np(tlin(x))
    fdense = fnn.Dense(5)
    params = {"params": {"kernel": jnp.asarray(linear_kernel(_np(tlin.weight))),
                         "bias": jnp.asarray(_np(tlin.bias))}}
    out = fdense.apply(params, jnp.asarray(_np(x)))
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)


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
                    torch.nn.BatchNorm2d(cout),
                )
            else:
                self.downsample = None

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + idn)

    return Block()


class _TorchMiniResNet(torch.nn.Module):
    """conv1/bn1 + 2 stages of 1 BasicBlock, reference state-dict naming."""

    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.layer1 = torch.nn.Sequential(_torch_basic_block(64, 64, 1))
        self.layer2 = torch.nn.Sequential(_torch_basic_block(64, 128, 2))

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = torch.nn.functional.max_pool2d(x, 3, 2, 1)
        x = self.layer1(x)
        return self.layer2(x)


def test_full_resnet_conversion_parity():
    """Converted mini-ResNet (eval mode, running stats) matches torch."""
    from artiboost_tpu.models.resnet import BasicBlock, ResNet

    tm = _TorchMiniResNet().eval()
    # randomize BN stats so the test catches mean/var mix-ups
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.3, 0.3)

    sd = {"backbone." + k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_resnet(sd, "backbone.")

    x = torch.randn(2, 3, 32, 32)
    ref = _np(tm(x)).transpose(0, 2, 3, 1)

    fm = ResNet(block_cls=BasicBlock, stage_sizes=(1, 1))
    out = fm.apply({"params": params, "batch_stats": stats},
                   jnp.asarray(_np(x).transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(out["res_layer2"]), ref, **TOL)


def test_convert_mlp_ordering():
    sd = {
        "box_head.net.0.weight": np.random.randn(4, 8).astype(np.float32),
        "box_head.net.0.bias": np.random.randn(4).astype(np.float32),
        "box_head.net.2.weight": np.random.randn(2, 4).astype(np.float32),
        "box_head.net.10.weight": np.random.randn(1, 2).astype(np.float32),
    }
    params = convert_mlp(sd, "box_head.")
    assert params["Dense_0"]["kernel"].shape == (8, 4)
    assert params["Dense_1"]["kernel"].shape == (4, 2)
    assert params["Dense_2"]["kernel"].shape == (2, 1)  # numeric sort, not lexical


def test_iknet_stack_conversion_parity():
    """Torch (Linear+BN1d+ReLU)*2 + Linear head == flax IKNet with
    converted weights (eval mode, randomized running stats)."""
    from artiboost_tpu.postprocess.iknet import IKNet
    from artiboost_tpu.utils.torch_convert import convert_dense_bn_stack

    hidden = (8, 16)

    class TorchIK(torch.nn.Module):
        def __init__(self):
            super().__init__()
            layers, cin = [], 63
            for h in hidden:
                layers += [torch.nn.Linear(cin, h), torch.nn.BatchNorm1d(h),
                           torch.nn.ReLU()]
                cin = h
            layers.append(torch.nn.Linear(cin, 64))
            self.net = torch.nn.Sequential(*layers)

        def forward(self, x):
            q = self.net(x).reshape(-1, 16, 4)
            return q / q.norm(dim=-1, keepdim=True).clamp_min(1e-8)

    tm = TorchIK().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.5, 1.5)

    joints = torch.randn(3, 21, 3) * 0.1
    ref = _np(tm(joints.reshape(3, 63)))

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_dense_bn_stack(sd)
    fik = IKNet(hidden_size_pose=hidden)
    _, quat = fik.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(_np(joints)), train=False)
    np.testing.assert_allclose(np.asarray(quat), ref, **TOL)


def test_hpregnet_head_conversion_parity():
    """convert_hpregnet maps the ManoBranch/TransHead Linears with
    reference state-dict naming (hpregnet.py:34-37, mano.py:65-96)."""
    from artiboost_tpu.utils.torch_convert import convert_hpregnet

    class _TorchHeads(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.base_layer = torch.nn.Sequential(
                torch.nn.Linear(512, 512), torch.nn.ReLU(),
                torch.nn.Linear(512, 512), torch.nn.ReLU())
            self.pose_reg = torch.nn.Linear(512, 18)
            # the reference wraps shape_reg in nn.Sequential (mano.py:95)
            self.shape_reg = torch.nn.Sequential(torch.nn.Linear(512, 10))

    class _TorchTrans(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.decoder = torch.nn.Sequential(
                torch.nn.Linear(512, 256), torch.nn.ReLU())
            self.final_layer = torch.nn.Linear(256, 9)

        def forward(self, x):
            return self.final_layer(self.decoder(x))

    heads, trans = _TorchHeads(), _TorchTrans()
    sd = {"mano_branch." + k: v.detach().numpy()
          for k, v in heads.state_dict().items()}
    sd.update({"obj_transfhead." + k: v.detach().numpy()
               for k, v in trans.state_dict().items()})
    # minimal fake resnet so convert_resnet has something to chew on
    mini = _TorchMiniResNet()
    sd.update({"base_net." + k: v.detach().numpy()
               for k, v in mini.state_dict().items()})

    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".pth.tar") as f:
        torch.save({"state_dict": {k: torch.as_tensor(v)
                                   for k, v in sd.items()}}, f.name)
        variables = convert_hpregnet(f.name)

    p = variables["params"]
    # forward parity of the TransHead through our flax module
    from artiboost_tpu.models.hpregnet import TransHead
    x = torch.randn(4, 512)
    ref = _np(trans(x))
    out = TransHead(out_dim=9).apply({"params": p["obj_transfhead"]},
                                     jnp.asarray(_np(x)))
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)
    # mano branch dense stack shapes landed
    assert p["mano_branch"]["Dense_2"]["kernel"].shape == (512, 18)
    assert p["mano_branch"]["Dense_3"]["bias"].shape == (10,)


def test_honet_hasson_conversion_parity():
    """convert_honet remaps HASSON[CVPR2020] keys (honetMANO.py:78-111):
    scaletrans_branch -> mano_transhead, scaletrans_branch_obj ->
    obj_transhead, mano_layer_left dropped."""
    from artiboost_tpu.utils.torch_convert import convert_honet

    class _TorchHeads(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.base_layer = torch.nn.Sequential(
                torch.nn.Linear(512, 512), torch.nn.ReLU(),
                torch.nn.Linear(512, 512), torch.nn.ReLU())
            self.pose_reg = torch.nn.Linear(512, 18)
            self.shape_reg = torch.nn.Sequential(torch.nn.Linear(512, 10))

    class _TorchTrans(torch.nn.Module):
        def __init__(self, out_dim):
            super().__init__()
            self.decoder = torch.nn.Sequential(
                torch.nn.Linear(512, 256), torch.nn.ReLU())
            self.final_layer = torch.nn.Linear(256, out_dim)

        def forward(self, x):
            return self.final_layer(self.decoder(x))

    heads = _TorchHeads()
    t_mano, t_obj = _TorchTrans(3), _TorchTrans(6)
    sd = {"mano_branch." + k: v.detach().numpy()
          for k, v in heads.state_dict().items()}
    # HASSON naming on disk, plus left-hand buffers that must be dropped
    sd.update({"scaletrans_branch." + k: v.detach().numpy()
               for k, v in t_mano.state_dict().items()})
    sd.update({"scaletrans_branch_obj." + k: v.detach().numpy()
               for k, v in t_obj.state_dict().items()})
    sd["mano_branch.mano_layer_left.th_shapedirs"] = np.zeros((2, 2), np.float32)
    sd["mano_branch.mano_layer_right.th_shapedirs"] = np.zeros((2, 2), np.float32)
    mini = _TorchMiniResNet()
    sd.update({"base_net." + k: v.detach().numpy()
               for k, v in mini.state_dict().items()})

    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".pth.tar") as f:
        torch.save({"state_dict": {k: torch.as_tensor(v)
                                   for k, v in sd.items()}}, f.name)
        variables = convert_honet(f.name)

    p = variables["params"]
    from artiboost_tpu.models.hpregnet import TransHead
    x = torch.randn(4, 512)
    for name, tmod, dim in (("mano_transhead", t_mano, 3),
                            ("obj_transhead", t_obj, 6)):
        out = TransHead(out_dim=dim).apply({"params": p[name]},
                                           jnp.asarray(_np(x)))
        np.testing.assert_allclose(np.asarray(out), _np(tmod(x)), **TOL)
    assert not any("mano_layer" in k for k in p)


def test_rotmat_mode_mano_branch():
    """use_pca=False ManoBranch: 16x9 head -> SVD projection -> FK
    (reference mano.py:75; rotmat_proj parity with manotorch rotprojs)."""
    from artiboost_tpu.mano import synthetic_mano_model
    from artiboost_tpu.models.hpregnet import ManoBranch
    from artiboost_tpu.utils.transform import aa_to_rotmat, rotmat_proj

    # rotmat_proj: already-orthonormal input is a fixpoint; noisy input
    # projects to a proper rotation
    rng = np.random.RandomState(0)
    aa = jnp.asarray(rng.randn(8, 3).astype(np.float32))
    R = aa_to_rotmat(aa)
    np.testing.assert_allclose(np.asarray(rotmat_proj(R)), np.asarray(R), atol=1e-5)
    noisy = R + 0.05 * jnp.asarray(rng.randn(8, 3, 3).astype(np.float32))
    P = np.asarray(rotmat_proj(noisy))
    eye = np.einsum("bij,bkj->bik", P, P)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
    assert np.allclose(np.linalg.det(P), 1.0, atol=1e-5)

    mb = ManoBranch(mano_model=synthetic_mano_model(), use_pca=False)
    feat = jnp.asarray(rng.randn(2, 512).astype(np.float32))
    out = mb.init_with_output(jax.random.PRNGKey(0), feat)[0]
    assert out["joints_3d"].shape == (2, 21, 3)
    assert out["mano_pca_pose"].shape == (2, 144)
    assert np.isfinite(np.asarray(out["hand_verts_3d"])).all()
