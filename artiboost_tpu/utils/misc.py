"""Framework-wide constants and small helpers.

Parity notes: constants mirror the reference's ``anakin/utils/misc.py``
(CONST class, lines 64-119) — joint topology, corner-cube edges, YCB id
map, reference bone length, and the renderer extrinsic flip.
"""
from __future__ import annotations

import functools
import math
from enum import Enum

import numpy as np


class TrainMode(Enum):
    TRAIN = 0
    VAL = 1
    TEST = 2


class CONST:
    PI = math.pi
    INT_MAX = 2**32 - 1
    NUM_JOINTS = 21
    NUM_CORNERS = 8
    NUM_MANO_VERTS = 778
    NUM_MANO_JOINTS = 16
    SIDE = "right"
    DUMMY = "dummy"
    # parent of each of the 21 keypoints (wrist-rooted kinematic tree)
    JOINTS_IDX_PARENTS = [0, 0, 1, 2, 3, 0, 5, 6, 7, 0, 9, 10, 11, 0, 13, 14, 15, 0, 17, 18, 19]
    # the 12 edges of the corner cube, as vertex-index pairs
    CORNERCUBE_IDX_ORDER = [
        (0, 1), (0, 2), (1, 3), (2, 3),
        (0, 4), (1, 5), (2, 6), (3, 7),
        (4, 5), (4, 6), (5, 7), (6, 7),
    ]
    REF_BONE_LEN = 0.09473151311686484  # meters, wrist->middle-MCP
    # OpenGL-style camera flip used between CV camera coords and the renderer
    PYRENDER_EXTRINSIC = np.array(
        [
            [1, 0, 0, 0],
            [0, -1, 0, 0],
            [0, 0, -1, 0],
            [0, 0, 0, 1],
        ],
        dtype=np.float32,
    )
    YCB_IDX2CLASSES = {
        1: "002_master_chef_can",
        2: "003_cracker_box",
        3: "004_sugar_box",
        4: "005_tomato_soup_can",
        5: "006_mustard_bottle",
        6: "007_tuna_fish_can",
        7: "008_pudding_box",
        8: "009_gelatin_box",
        9: "010_potted_meat_can",
        10: "011_banana",
        11: "019_pitcher_base",
        12: "021_bleach_cleanser",
        13: "024_bowl",
        14: "025_mug",
        15: "035_power_drill",
        16: "036_wood_block",
        17: "037_scissors",
        18: "040_large_marker",
        19: "051_large_clamp",
        20: "052_extra_large_clamp",
        21: "061_foam_brick",
    }
    YCB_CLASSES2IDX = {v: k for k, v in YCB_IDX2CLASSES.items()}
    UVD_DEPTH_RANGE = 0.4  # meters


def enable_lower_param(func):
    """Make registered-component __init__ kwargs case-insensitive (upper wins)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        kw_uppers = {}
        for k, v in kwargs.items():
            kw_uppers[k.upper()] = v
        return func(*args, **kw_uppers)

    return wrapper


def singleton(cls):
    _instance = {}

    @functools.wraps(cls)
    def inner(*args, **kwargs):
        if cls not in _instance:
            _instance[cls] = cls(*args, **kwargs)
        return _instance[cls]

    return inner


def asset_path(rel: str) -> str:
    """Resolve a repo-relative asset path (e.g. ``assets/iknet_tpu.npz``).

    Tries CWD first (the documented invocation is from the repo root),
    then falls back to the package's parent directory so scripts run
    from elsewhere still find shipped assets.
    """
    import os

    if os.path.exists(rel):
        return rel
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cand = os.path.join(pkg_root, rel)
    return cand if os.path.exists(cand) else rel


def camel_to_snake(name: str) -> str:
    out = []
    for i, ch in enumerate(name):
        if ch.isupper() and i > 0 and (not name[i - 1].isupper()):
            out.append("_")
        out.append(ch.lower())
    return "".join(out)


def resolve_dtype(dtype):
    """Accept a YAML string ("bfloat16", "float32"), numpy/jnp dtype, or
    None (-> float32) and return a jnp dtype for flax compute dtypes."""
    import jax.numpy as jnp

    if dtype is None:
        return jnp.float32
    if isinstance(dtype, str):
        return {"bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
                "float32": jnp.float32, "fp32": jnp.float32,
                "float16": jnp.float16, "fp16": jnp.float16}[dtype.lower()]
    return dtype


def param_size(params) -> float:
    """Total size of a jax pytree of params, in millions of scalars."""
    import jax

    return sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params)) / 1e6
