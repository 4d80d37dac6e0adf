"""YAML config loading.

Same schema as the reference configs (``config/*.yaml``): plain nested
dicts with UPPERCASE keys, loaded by ``anakin/utils/misc.py:122``'s
``update_config``. We keep plain dicts (jit-friendly: configs stay on
the host, only arrays cross into traced code).
"""
from __future__ import annotations

import copy
from typing import Any, Dict

import yaml


def load_config(path: str) -> Dict[str, Any]:
    with open(path, "r") as f:
        cfg = yaml.safe_load(f)
    return cfg


# alias matching the reference API name
update_config = load_config


def merge_config(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    """Recursively merge ``override`` into a deep copy of ``base``."""
    out = copy.deepcopy(base)
    for k, v in (override or {}).items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_config(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def dump_config(cfg: Dict[str, Any], path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
