"""Pretrained-weight initialization for Arch models.

Parity: the reference loads two kinds of pretrained weights at model
build time —

- ``ARCH.PRETRAINED`` (a released ``.pth.tar``): full-model reload,
  ``anakin/models/hybridbaseline.py:109-126`` (init_weights) and
  ``anakin/models/hpregnet.py:51``;
- ``ARCH.BACKBONE.PRETRAINED: true``: torchvision ImageNet weights,
  ``anakin/models/resnet.py:193-197``.

Here both run AFTER ``create_train_state`` and functionally rebuild the
params/batch_stats pytrees (no in-place mutation): torch state dicts are
converted via ``utils/torch_convert`` and deep-merged over the
initialized trees with shape checking. Per the reference's own warning
(hybridbaseline.py:23-26), a full-model PRETRAINED overrides the
ImageNet backbone init, so backbone weights load first and the full
checkpoint second.

This machine ships no torchvision and no released checkpoints, so all
paths degrade to warn-and-keep-scratch-init; the converters themselves
are parity-tested against torch fixtures in tests/test_torch_convert.py
and tests/test_pretrained.py.
"""
from __future__ import annotations

import glob
import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from artiboost_tpu.utils.logger import logger
from artiboost_tpu.utils import torch_convert

# repo root (…/artiboost_tpu/utils/pretrained.py -> …/)
_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# torchvision weight-file basenames per backbone TYPE (for the ImageNet
# init): any file matching these globs under the search roots is used
_IMAGENET_GLOBS = {
    "ResNet18": ("resnet18*.pth", "resnet18*.pt"),
    "ResNet34": ("resnet34*.pth", "resnet34*.pt"),
    "ResNet50": ("resnet50*.pth", "resnet50*.pt"),
    "ResNet101": ("resnet101*.pth", "resnet101*.pt"),
    "ResNet152": ("resnet152*.pth", "resnet152*.pt"),
}

# ARCH TYPE -> full-checkpoint converter (each returns
# {"params": ..., "batch_stats": ...} matching the flax module's tree)
_ARCH_CONVERTERS = {
    "HybridBaseline": torch_convert.convert_hybrid_baseline,
    "SimpleBaseline": torch_convert.convert_simple_baseline,
    "HOPRegNet": torch_convert.convert_hpregnet,
    "HoNet": torch_convert.convert_honet,
}


def resolve_path(path: str) -> Optional[str]:
    """Resolve ``path`` against CWD then the repo root."""
    for cand in (path, os.path.join(_PKG_ROOT, path)):
        if os.path.exists(cand):
            return cand
    return None


def _find_imagenet_weights(backbone_type: str, hint: Any) -> Optional[str]:
    """``hint`` is the BACKBONE.PRETRAINED value: an explicit path, or
    ``true`` -> search checkpoints/imagenet/ and the torch hub cache."""
    if isinstance(hint, str):
        return resolve_path(hint)
    globs = _IMAGENET_GLOBS.get(backbone_type)
    if not globs:
        return None
    roots = (
        os.path.join(os.getcwd(), "checkpoints", "imagenet"),
        os.path.join(_PKG_ROOT, "checkpoints", "imagenet"),
        os.path.expanduser("~/.cache/torch/hub/checkpoints"),
    )
    for root in roots:
        for g in globs:
            hits = sorted(glob.glob(os.path.join(root, g)))
            if hits:
                return hits[0]
    return None


def _merge_checked(init_tree: Dict, new_tree: Dict, scope: str) -> Dict:
    """Deep-merge ``new_tree`` leaves over ``init_tree``, requiring every
    new leaf to exist in init with the same shape (a converted released
    checkpoint must tile exactly onto the flax module it claims parity
    with — a silent mismatch would corrupt eval without crashing)."""
    out = dict(init_tree)
    for k, v in new_tree.items():
        if k not in init_tree:
            raise KeyError(f"pretrained leaf {scope}/{k} not present in the "
                           f"initialized model (have: {sorted(init_tree)})")
        if isinstance(v, dict):
            out[k] = _merge_checked(init_tree[k], v, f"{scope}/{k}")
        else:
            ref = init_tree[k]
            have, want = tuple(np.shape(ref)), tuple(np.shape(v))
            if have != want:
                raise ValueError(f"pretrained leaf {scope}/{k} shape {want} "
                                 f"!= model shape {have}")
            dtype = getattr(ref, "dtype", None)
            out[k] = np.asarray(v, dtype=dtype) if dtype is not None else v
    return out


def _model_scopes(params: Dict, n_models: int) -> List[str]:
    """Arch stores its models in a tuple attribute, so flax scopes them
    ``model_list_{i}``; a bare single model (tests) keeps its own tree."""
    scopes = [f"model_list_{i}" for i in range(n_models)]
    if all(s in params for s in scopes):
        return scopes
    if n_models == 1:
        return [""]  # params IS the single model's tree
    raise KeyError(f"cannot locate model scopes in params (top-level keys: "
                   f"{sorted(params)})")


def _sub(tree: Dict, scope: str) -> Dict:
    return tree if scope == "" else tree.get(scope, {})


def _set_sub(tree: Dict, scope: str, value: Dict) -> Dict:
    if scope == "":
        return value
    out = dict(tree)
    out[scope] = value
    return out


def load_backbone_imagenet(params: Dict, stats: Dict, model_cfg: Dict,
                           scope: str) -> Tuple[Dict, Dict, bool]:
    """Honor ``BACKBONE.PRETRAINED`` for one model entry."""
    bb_cfg = model_cfg.get("BACKBONE") or {}
    hint = bb_cfg.get("PRETRAINED")
    if not hint:
        return params, stats, False
    bb_type = bb_cfg.get("TYPE", "")
    path = _find_imagenet_weights(bb_type, hint)
    if path is None:
        logger.warning(
            f"BACKBONE.PRETRAINED={hint!r} for {bb_type}: no local ImageNet "
            f"weights found (checkpoints/imagenet/, torch hub cache) — "
            f"keeping scratch init")
        return params, stats, False
    sd = torch_convert.load_torch_state_dict(path)
    bb_params, bb_stats = torch_convert.convert_resnet(sd, prefix="")
    mtree = _sub(params, scope)
    stree = _sub(stats, scope)
    if "backbone" not in mtree:
        logger.warning(f"model {model_cfg.get('TYPE')} has no 'backbone' "
                       f"scope; skipping ImageNet init")
        return params, stats, False
    mtree = dict(mtree)
    stree = dict(stree)
    mtree["backbone"] = _merge_checked(mtree["backbone"], bb_params,
                                      f"{scope}/backbone")
    stree["backbone"] = _merge_checked(stree.get("backbone", {}), bb_stats,
                                      f"{scope}/backbone")
    logger.info(f"loaded ImageNet {bb_type} backbone weights from {path}")
    return _set_sub(params, scope, mtree), _set_sub(stats, scope, stree), True


def load_model_checkpoint(params: Dict, stats: Dict, model_cfg: Dict,
                          scope: str) -> Tuple[Dict, Dict, bool]:
    """Honor a full-model ``PRETRAINED: …pth.tar`` for one model entry."""
    path = model_cfg.get("PRETRAINED")
    if not path or not isinstance(path, str):
        return params, stats, False
    rpath = resolve_path(path)
    if rpath is None:
        logger.warning(f"ARCH.PRETRAINED={path!r} not found on disk — "
                       f"keeping current init")
        return params, stats, False
    mtype = model_cfg.get("TYPE", "")
    conv = _ARCH_CONVERTERS.get(mtype)
    if conv is None:
        logger.warning(f"no torch-checkpoint converter for model TYPE "
                       f"{mtype!r}; keeping current init")
        return params, stats, False
    variables = conv(rpath)
    params = _set_sub(params, scope,
                      _merge_checked(_sub(params, scope),
                                     variables.get("params", {}), scope))
    if variables.get("batch_stats"):
        stats = _set_sub(stats, scope,
                         _merge_checked(_sub(stats, scope),
                                        variables["batch_stats"], scope))
    logger.info(f"loaded released checkpoint {rpath} into {mtype}")
    return params, stats, True


def load_arch_pretrained(state, arch_cfg) -> Tuple[Any, bool]:
    """Apply all PRETRAINED directives in ``arch_cfg`` to ``state``.

    Returns (new_state, loaded_any). Backbone ImageNet init first, full
    released checkpoints second (the reference's override order,
    hybridbaseline.py:23-33).
    """
    import flax.core

    cfgs = arch_cfg if isinstance(arch_cfg, list) else [arch_cfg]
    params = flax.core.unfreeze(state.params)
    stats = flax.core.unfreeze(state.batch_stats or {})
    scopes = _model_scopes(params, len(cfgs))
    loaded_any = False
    for c, scope in zip(cfgs, scopes):
        params, stats, did = load_backbone_imagenet(params, stats, c, scope)
        loaded_any |= did
        params, stats, did = load_model_checkpoint(params, stats, c, scope)
        loaded_any |= did
    if not loaded_any:
        return state, False
    return state.replace(params=params, batch_stats=stats), True
