"""Torch checkpoint -> JAX pytree conversion.

Converts the reference's released ``.pth.tar`` checkpoints
(HybridBaseline/SimpleBaseline ResNet+head weights, GrabNet refinenet,
IKNet) into this framework's flax parameter trees: strips the
``module.`` DataParallel prefix (reference hybridbaseline.py:109-126),
transposes conv kernels OIHW -> HWIO, linear weights (out,in) ->
(in,out), and maps BN running stats into the batch_stats collection.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    blob = torch.load(path, map_location="cpu")
    if isinstance(blob, dict) and "state_dict" in blob:
        blob = blob["state_dict"]
    out = {}
    for k, v in blob.items():
        if k.startswith("module."):
            k = k[7:]
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def deconv_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (in, out, kH, kW) -> flax ConvTranspose HWIO.

    flax's ConvTranspose (transpose_kernel=False) runs a fractionally-
    strided *correlation* without flipping, while torch's ConvTranspose2d
    is the gradient of a correlation — so the spatial taps must be
    reversed on top of the layout transpose (verified numerically in
    tests/test_torch_convert.py::test_deconv_parity)."""
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()


def linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def convert_resnet(sd: Dict[str, np.ndarray], prefix: str = "backbone."
                   ) -> Tuple[Dict, Dict]:
    """Torchvision-style ResNet state dict -> (params, batch_stats) for
    ``artiboost_tpu.models.resnet.ResNet``.

    Name mapping: layer{i}.{j} -> layer{i}_{j}; the downsample conv/bn
    become the extra Conv/BatchNorm instances flax creates for the
    residual path (Conv_2 / BatchNorm_2 in block scope order).
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, scope_path, leaf, value):
        node = tree
        for s in scope_path:
            node = node.setdefault(s, {})
        node[leaf] = value

    def bn(tree_p, tree_s, scope, torch_prefix):
        put(tree_p, scope, "scale", sd[torch_prefix + ".weight"])
        put(tree_p, scope, "bias", sd[torch_prefix + ".bias"])
        put(tree_s, scope, "mean", sd[torch_prefix + ".running_mean"])
        put(tree_s, scope, "var", sd[torch_prefix + ".running_var"])

    put(params, ["conv1"], "kernel", conv_kernel(sd[prefix + "conv1.weight"]))
    bn(params, stats, ["bn1"], prefix + "bn1")

    block_pat = re.compile(rf"^{re.escape(prefix)}layer(\d+)\.(\d+)\.")
    blocks = sorted({(int(m.group(1)), int(m.group(2)))
                     for k in sd if (m := block_pat.match(k))})
    for li, bi in blocks:
        tp = f"{prefix}layer{li}.{bi}."
        scope = f"layer{li}_{bi}"
        has_bottleneck = tp + "conv3.weight" in sd
        n_convs = 3 if has_bottleneck else 2
        ci = 0
        for c in range(1, n_convs + 1):
            put(params, [scope, f"Conv_{ci}"], "kernel",
                conv_kernel(sd[tp + f"conv{c}.weight"]))
            bn(params, stats, [scope, f"BatchNorm_{ci}"], tp + f"bn{c}")
            ci += 1
        if tp + "downsample.0.weight" in sd:
            put(params, [scope, f"Conv_{ci}"], "kernel",
                conv_kernel(sd[tp + "downsample.0.weight"]))
            bn(params, stats, [scope, f"BatchNorm_{ci}"], tp + "downsample.1")
    return params, stats


def convert_integral_head(sd: Dict[str, np.ndarray], prefix: str
                          ) -> Tuple[Dict, Dict]:
    """Deconv stack + final conv of IntegralDeconvHead."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    deconv_ws = sorted(
        k for k in sd if k.startswith(prefix + "deconv_layers") and k.endswith(".weight")
        and sd[k].ndim == 4)
    bn_ws = sorted(
        k for k in sd
        if k.startswith(prefix + "deconv_layers") and k.endswith(".running_mean"))
    for i, k in enumerate(deconv_ws):
        params[f"ConvTranspose_{i}"] = {"kernel": deconv_kernel(sd[k])}
    for i, k in enumerate(bn_ws):
        base = k[: -len(".running_mean")]
        params[f"BatchNorm_{i}"] = {"scale": sd[base + ".weight"],
                                    "bias": sd[base + ".bias"]}
        stats[f"BatchNorm_{i}"] = {"mean": sd[base + ".running_mean"],
                                   "var": sd[base + ".running_var"]}
    params["Conv_0"] = {"kernel": conv_kernel(sd[prefix + "final_layer.weight"]),
                        "bias": sd[prefix + "final_layer.bias"]}
    return params, stats


def convert_mlp(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    """Sequential Linear stack -> Dense_{i}."""
    params: Dict[str, Any] = {}
    lin = sorted((k for k in sd if k.startswith(prefix) and k.endswith(".weight")
                  and sd[k].ndim == 2),
                 key=lambda k: [int(x) for x in re.findall(r"\d+", k[len(prefix):])])
    for i, k in enumerate(lin):
        base = k[: -len(".weight")]
        params[f"Dense_{i}"] = {"kernel": linear_kernel(sd[k])}
        if base + ".bias" in sd:
            params[f"Dense_{i}"]["bias"] = sd[base + ".bias"]
    return params


def convert_dense_bn_stack(sd: Dict[str, np.ndarray], prefix: str = ""
                           ) -> Tuple[Dict, Dict]:
    """Torch (Linear, BatchNorm1d)* + Linear stack -> flax Dense_i /
    BatchNorm_i params+stats (the IKNet layout,
    ``anakin/postprocess/iknet/model.py:6-35``). Layers pair by order of
    their numeric keys; trailing Linears without a following BN are the
    head(s)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def order_key(k):
        return [int(x) for x in re.findall(r"\d+", k[len(prefix):])]

    lin = sorted((k for k in sd if k.startswith(prefix) and k.endswith(".weight")
                  and sd[k].ndim == 2), key=order_key)
    bns = sorted((k for k in sd if k.startswith(prefix)
                  and k.endswith(".running_mean")), key=order_key)
    for i, k in enumerate(lin):
        base = k[: -len(".weight")]
        params[f"Dense_{i}"] = {"kernel": linear_kernel(sd[k])}
        if base + ".bias" in sd:
            params[f"Dense_{i}"]["bias"] = sd[base + ".bias"]
    for i, k in enumerate(bns):
        base = k[: -len(".running_mean")]
        params[f"BatchNorm_{i}"] = {"scale": sd[base + ".weight"],
                                    "bias": sd[base + ".bias"]}
        stats[f"BatchNorm_{i}"] = {"mean": sd[base + ".running_mean"],
                                   "var": sd[base + ".running_var"]}
    return params, stats


def convert_iknet(path: str) -> Dict:
    """Released IKNet torch checkpoint -> flax variables for
    ``artiboost_tpu.postprocess.iknet.IKNet``."""
    sd = load_torch_state_dict(path)
    params, stats = convert_dense_bn_stack(sd)
    return {"params": params, "batch_stats": stats}


def convert_hybrid_baseline(path: str) -> Dict:
    """Released HybridBaseline .pth.tar -> flax variables dict."""
    sd = load_torch_state_dict(path)
    bb_params, bb_stats = convert_resnet(sd, "backbone.")
    head_params, head_stats = convert_integral_head(sd, "hybrid_head.")
    box_params = convert_mlp(sd, "box_head.")
    return {
        "params": {"backbone": bb_params, "hybrid_head": head_params,
                   "box_head": box_params},
        "batch_stats": {"backbone": bb_stats, "hybrid_head": head_stats},
    }


def convert_simple_baseline(path: str) -> Dict:
    """Released SimpleBaseline .pth.tar -> flax variables dict.

    Reference layout (``anakin/models/simplebaseline.py:194-241``):
    ``backbone.*`` torchvision ResNet + ``pose_head.*`` IntegralDeconvHead
    (deconv stack + final 1x1 conv) — the same two converters
    HybridBaseline uses, under SimpleBaseline's attribute names."""
    sd = load_torch_state_dict(path)
    bb_params, bb_stats = convert_resnet(sd, "backbone.")
    head_params, head_stats = convert_integral_head(sd, "pose_head.")
    return {
        "params": {"backbone": bb_params, "pose_head": head_params},
        "batch_stats": {"backbone": bb_stats, "pose_head": head_stats},
    }


def _hasson_remap(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """HASSON[CVPR2020] released checkpoints -> HoNet key layout (parity:
    ``anakin/models/honetMANO.py:78-111`` _load_from_state_dict): drop the
    left-hand MANO buffers, keep the right hand as ``mano_layer``, and
    rename the scale/trans branches."""
    out = {}
    for k, v in sd.items():
        if "mano_layer_left" in k:
            continue
        k = k.replace("mano_layer_right", "mano_layer")
        k = k.replace("scaletrans_branch_obj", "obj_transhead")
        k = k.replace("scaletrans_branch.", "mano_transhead.")
        out[k] = v
    return out


def convert_honet(path: str) -> Dict:
    """Released HoNet / HASSON-style .pth.tar -> flax variables dict
    (layout: ``anakin/models/honetMANO.py:36-41`` — base_net ResNet18,
    mano_branch as in hpregnet, mano_transhead (out 3) + obj_transhead
    (out 6) two-layer TransHeads)."""
    sd = _hasson_remap(load_torch_state_dict(path))
    bb_params, bb_stats = convert_resnet(sd, "base_net.")

    def dense(torch_name):
        return {"kernel": linear_kernel(sd[f"{torch_name}.weight"]),
                "bias": sd[f"{torch_name}.bias"]}

    mano_branch = {
        "Dense_0": dense("mano_branch.base_layer.0"),
        "Dense_1": dense("mano_branch.base_layer.2"),
        "Dense_2": dense("mano_branch.pose_reg"),
    }
    if "mano_branch.shape_reg.0.weight" in sd:
        mano_branch["Dense_3"] = dense("mano_branch.shape_reg.0")
    elif "mano_branch.shape_reg.weight" in sd:
        mano_branch["Dense_3"] = dense("mano_branch.shape_reg")
    heads = {
        name: {"Dense_0": dense(f"{name}.decoder.0"),
               "Dense_1": dense(f"{name}.final_layer")}
        for name in ("mano_transhead", "obj_transhead")
    }
    return {
        "params": {"backbone": bb_params, "mano_branch": mano_branch, **heads},
        "batch_stats": {"backbone": bb_stats},
    }


def convert_hpregnet(path: str) -> Dict:
    """Released HOPRegNet ("Reg") .pth.tar -> flax variables dict.

    Reference layout (``anakin/models/hpregnet.py:34-37``,
    ``anakin/models/mano.py:65-96``): ``base_net.*`` ResNet18,
    ``mano_branch.base_layer.{0,2}`` two 512-wide Linears (ReLU
    interleaved at odd indices), ``mano_branch.pose_reg`` /
    ``mano_branch.shape_reg`` heads, ``obj_transfhead.decoder.0`` +
    ``obj_transfhead.final_layer`` (inp//2 bottleneck, 9-dim out).
    """
    sd = load_torch_state_dict(path)
    bb_params, bb_stats = convert_resnet(sd, "base_net.")

    def dense(torch_name):
        return {"kernel": linear_kernel(sd[f"{torch_name}.weight"]),
                "bias": sd[f"{torch_name}.bias"]}

    mano_branch = {
        "Dense_0": dense("mano_branch.base_layer.0"),
        "Dense_1": dense("mano_branch.base_layer.2"),
        "Dense_2": dense("mano_branch.pose_reg"),
    }
    # the reference wraps shape_reg in nn.Sequential(nn.Linear(...))
    # (anakin/models/mano.py:95), so released checkpoints carry
    # "mano_branch.shape_reg.0.weight"; accept a bare Linear too.
    if "mano_branch.shape_reg.0.weight" in sd:
        mano_branch["Dense_3"] = dense("mano_branch.shape_reg.0")
    elif "mano_branch.shape_reg.weight" in sd:
        mano_branch["Dense_3"] = dense("mano_branch.shape_reg")
    transfhead = {
        "Dense_0": dense("obj_transfhead.decoder.0"),
        "Dense_1": dense("obj_transfhead.final_layer"),
    }
    return {
        "params": {"backbone": bb_params, "mano_branch": mano_branch,
                   "obj_transfhead": transfhead},
        "batch_stats": {"backbone": bb_stats},
    }
