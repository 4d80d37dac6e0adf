"""BOP-style object symmetry transform enumeration.

Parity: ``anakin/utils/bop_toolkit/bop_misc.py:18-66``
(get_symmetry_transformations) + the padded-tensor packing done in
``anakin/criterions/symcornerloss.py:23-49``. Output is a dense padded
(R, t, valid) tensor per object so the symmetry-min reduces to one
masked min inside jit.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from artiboost_tpu.utils.transform import aa_to_rotmat


def _axis_rotmat(angle: float, axis: np.ndarray) -> np.ndarray:
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    import jax.numpy as jnp

    return np.asarray(aa_to_rotmat(jnp.asarray(axis * angle, dtype=jnp.float32)))


def get_symmetry_transformations(model_info: Dict, max_sym_disc_step: float = 0.01) -> List[Dict]:
    """Enumerate discrete + discretized-continuous symmetry transforms."""
    trans_disc = [{"R": np.eye(3), "t": np.zeros((3, 1))}]
    for sym in model_info.get("symmetries_discrete", []):
        sym_4x4 = np.reshape(np.asarray(sym, dtype=np.float64), (4, 4))
        trans_disc.append({"R": sym_4x4[:3, :3], "t": sym_4x4[:3, 3].reshape(3, 1)})

    trans_cont = []
    for sym in model_info.get("symmetries_continuous", []):
        axis = np.asarray(sym["axis"], dtype=np.float64)
        offset = np.asarray(sym["offset"], dtype=np.float64).reshape(3, 1)
        n_steps = int(np.ceil(np.pi / max_sym_disc_step))
        step = 2.0 * np.pi / n_steps
        for i in range(1, n_steps):
            R = _axis_rotmat(i * step, axis)
            t = -R @ offset + offset
            trans_cont.append({"R": R, "t": t})

    out = []
    for td in trans_disc:
        if trans_cont:
            for tc in trans_cont:
                out.append({"R": tc["R"] @ td["R"], "t": tc["R"] @ td["t"] + tc["t"]})
        else:
            out.append(td)
    return out


def build_sym_tensor(
    model_info_path_or_dict,
    max_sym_disc_step: float = 0.01,
    mm_to_m: bool = True,
    max_sym_len: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pack per-object symmetry sets into padded arrays.

    Returns (R (N, S, 3, 3), t (N, S, 3, 1), valid (N, S)) where N is the
    number of objects (keys "1".."N") and S the max symmetry count.
    Padding entries are identity (valid=0).
    """
    if isinstance(model_info_path_or_dict, str):
        if not os.path.exists(model_info_path_or_dict):
            # configs ship deployment paths (./assets/extend_models_info.json);
            # degrade to identity-only symmetries when the asset is absent
            model_info = default_ycb_model_info()
        else:
            with open(model_info_path_or_dict) as f:
                model_info = json.load(f)
    else:
        model_info = model_info_path_or_dict

    n_obj = len(model_info)
    syms = [
        get_symmetry_transformations(model_info[str(i)], max_sym_disc_step)
        for i in range(1, n_obj + 1)
    ]
    S = max(len(s) for s in syms)
    if max_sym_len is not None:
        S = max(S, max_sym_len)
    R = np.tile(np.eye(3, dtype=np.float32), (n_obj, S, 1, 1))
    t = np.zeros((n_obj, S, 3, 1), dtype=np.float32)
    valid = np.zeros((n_obj, S), dtype=np.float32)
    for i, s in enumerate(syms):
        for k, tr in enumerate(s):
            R[i, k] = tr["R"].astype(np.float32)
            t[i, k] = tr["t"].astype(np.float32) * (0.001 if mm_to_m else 1.0)
            valid[i, k] = 1.0
    return R, t, valid


# A minimal YCB-ish default: identity-only symmetry for all 21 objects.
# Real runs should point MODEL_INFO_PATH at BOP's models_info.json.
def default_ycb_model_info(n_obj: int = 21) -> Dict:
    return {str(i): {} for i in range(1, n_obj + 1)}
