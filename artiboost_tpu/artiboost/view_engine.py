"""Viewpoint discretization + sampling, batched in JAX.

Parity: ``anakin/artiboost/view_engine.py`` — the view sphere is binned
by u in [-1, 1] x theta in [0, 2pi); a view id maps to its bin center,
jittered within the bin; the camera gets a random in-plane roll and a
random z offset. All batched over triplet ids under one key.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from artiboost_tpu.utils.transform import align_vector_to_z


class ViewEngineConfig(NamedTuple):
    persp_u_bins: int = 12
    persp_theta_bins: int = 24
    camera_z_min: float = 0.45
    camera_z_max: float = 0.55

    @property
    def n_persp(self) -> int:
        return self.persp_u_bins * self.persp_theta_bins


def persp_rotmat_from_id(
    cfg: ViewEngineConfig, persp_id: jnp.ndarray, key: jax.Array
) -> jnp.ndarray:
    """persp_id (B,) int -> (B, 3, 3) rotation aligning +z to the sampled
    view direction (bin center + intra-bin jitter)."""
    B = persp_id.shape[0]
    ku, kt = jax.random.split(key)
    u_id = persp_id // cfg.persp_theta_bins
    theta_id = persp_id % cfg.persp_theta_bins
    u_unit = 2.0 / cfg.persp_u_bins
    theta_unit = 2.0 * jnp.pi / cfg.persp_theta_bins
    u_center = (-1.0 + u_unit / 2.0) + u_id.astype(jnp.float32) * u_unit
    theta_center = theta_unit / 2.0 + theta_id.astype(jnp.float32) * theta_unit
    u = jnp.clip(u_center + (jax.random.uniform(ku, (B,)) - 0.5) * u_unit, -1.0, 1.0)
    theta = jnp.clip(theta_center + (jax.random.uniform(kt, (B,)) - 0.5) * theta_unit,
                     0.0, 2.0 * jnp.pi)
    s = jnp.sqrt(jnp.maximum(1.0 - u * u, 0.0))
    target = jnp.stack([s * jnp.cos(theta), s * jnp.sin(theta), u], axis=-1)
    return align_vector_to_z(target)


def persp_rotmat_centers(cfg: ViewEngineConfig) -> jnp.ndarray:
    """(n_persp, 3, 3) exact bin-center rotations (no jitter) — used for
    the one-time blacklist sweep."""
    ids = jnp.arange(cfg.n_persp)
    u_id = ids // cfg.persp_theta_bins
    theta_id = ids % cfg.persp_theta_bins
    u_unit = 2.0 / cfg.persp_u_bins
    theta_unit = 2.0 * jnp.pi / cfg.persp_theta_bins
    u = (-1.0 + u_unit / 2.0) + u_id.astype(jnp.float32) * u_unit
    theta = theta_unit / 2.0 + theta_id.astype(jnp.float32) * theta_unit
    s = jnp.sqrt(jnp.maximum(1.0 - u * u, 0.0))
    target = jnp.stack([s * jnp.cos(theta), s * jnp.sin(theta), u], axis=-1)
    return align_vector_to_z(target)


def sample_view(
    cfg: ViewEngineConfig, persp_id: jnp.ndarray, key: jax.Array
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (persp_rotmat (B, 3, 3), camera_free_rotmat (B, 3, 3),
    z_offset (B, 3)); parity with ViewEngine.get_view."""
    B = persp_id.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    persp = persp_rotmat_from_id(cfg, persp_id, k1)
    roll = jax.random.uniform(k2, (B,)) * 2.0 * jnp.pi
    c, s = jnp.cos(roll), jnp.sin(roll)
    zero, one = jnp.zeros_like(c), jnp.ones_like(c)
    cam_free = jnp.stack([
        jnp.stack([c, -s, zero], -1),
        jnp.stack([s, c, zero], -1),
        jnp.stack([zero, zero, one], -1),
    ], -2)
    z = jax.random.uniform(k3, (B,), minval=cfg.camera_z_min, maxval=cfg.camera_z_max)
    z_offset = jnp.stack([jnp.zeros_like(z), jnp.zeros_like(z), z], -1)
    return persp, cam_free, z_offset
