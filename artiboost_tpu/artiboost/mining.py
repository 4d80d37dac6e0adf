"""Hard-example mining — the per-epoch CCV weight-map updates.

Parity: the four ``update_method_k`` strategies in
``anakin/artiboost/artiboost_loader.py:503-598``, rewritten as pure
masked array ops over the dense (O, V, G) maps (the reference loops a
python dict of seen triplets; here ``seen`` is a boolean map coming
straight from the device-side ValMetric accumulators).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def _confidence(val_map: jnp.ndarray, seen: jnp.ndarray) -> jnp.ndarray:
    """(max - val) / range over the seen triplets (1 = easiest)."""
    big = jnp.asarray(jnp.finfo(val_map.dtype).max, val_map.dtype)
    vmin = jnp.min(jnp.where(seen, val_map, big))
    vmax = jnp.max(jnp.where(seen, val_map, -big))
    return (vmax - val_map) / (vmax - vmin + 1e-8)


def update_method_1(weight_map, val_map, seen, lower, upper, **kw) -> Dict:
    """Percentile reweight: w *= 1 / (confidence + 0.5), clamped."""
    conf = _confidence(val_map, seen)
    update = 1.0 / (conf + 0.5)
    new = jnp.where(seen, weight_map * update, weight_map)
    return {"sample_weight_map": jnp.clip(new, lower, upper)}


def update_method_2(weight_map, val_map, seen, lower, upper, **kw) -> Dict:
    """Incremental: -0.1 for easy (conf > 0.5), +0.1 for hard."""
    conf = _confidence(val_map, seen)
    delta = jnp.where(conf > 0.5, -0.1, 0.1)
    new = jnp.where(seen, weight_map + delta, weight_map)
    return {"sample_weight_map": jnp.clip(new, lower, upper)}


def update_method_3(weight_map, val_map, seen, lower, upper,
                    dist_lower_threshold=8.0, dist_upper_threshold=16.0, **kw) -> Dict:
    """Lower-bound deactivation (early shutdown): solved triplets get
    weight 0, very hard ones reset to 1, the rest decay by half."""
    low = val_map < dist_lower_threshold
    high = val_map > dist_upper_threshold
    new = jnp.where(low, 0.0, jnp.where(high, 1.0, weight_map * 0.5))
    new = jnp.where(seen, new, weight_map)
    n_seen = jnp.maximum(jnp.sum(seen.astype(jnp.float32)), 1.0)
    ratio = jnp.sum((low & seen).astype(jnp.float32)) / n_seen
    return {"sample_weight_map": new, "dist_lower_ratio": ratio}


def update_method_4(weight_map, val_map, seen, lower, upper,
                    dist_lower_threshold=8.0, dist_upper_threshold=16.0,
                    epoch_idx=0, n_epochs=100, **kw) -> Dict:
    """method_1 for the first 75% of epochs, then method_3."""
    if float(epoch_idx) / n_epochs < 0.75:
        out = update_method_1(weight_map, val_map, seen, lower, upper)
        out["dist_lower_ratio"] = jnp.asarray(-1.0)
        return out
    return update_method_3(
        weight_map, val_map, seen, lower, upper,
        dist_lower_threshold=dist_lower_threshold,
        dist_upper_threshold=dist_upper_threshold,
    )


def update_uniform(weight_map, val_map, seen, lower, upper, **kw) -> Dict:
    """No-mining baseline: weights untouched (the control arm of the
    mining A/B in script/mining_ab.py — uniform CCV sampling)."""
    return {"sample_weight_map": weight_map}


UPDATE_METHODS = {
    "method_1": update_method_1,
    "method_2": update_method_2,
    "method_3": update_method_3,
    "method_4": update_method_4,
    "uniform": update_uniform,
}
