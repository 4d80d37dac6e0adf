"""Per-joint anatomical axes for the hand (JAX rewrite of manotorch's
AxisLayer, consumed by the anatomically-aware scramblers — reference
``anakin/artiboost/scrambler.py:84-189``).

For each of the 15 articulated finger joints we derive, in world space:
  * ``b_axis`` — the bone (twist) direction leaving the joint,
  * ``l_axis`` — the bend ("left") axis, orthogonal to the bone and the
    palm up direction,
  * ``u_axis`` — the splay ("up") axis completing the frame.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

# For each articulated joint 1..15 (MANO-native order: index, middle,
# pinky, ring, thumb x 3 levels), the 21-kp index of the joint itself and
# of the next joint along the finger (tips for the distal joints).
# 21-kp order: 0 wrist; 1-4 thumb(MCP..tip); 5-8 index; 9-12 middle;
# 13-16 ring; 17-20 pinky.
_JOINT_KP = (5, 6, 7, 9, 10, 11, 17, 18, 19, 13, 14, 15, 1, 2, 3)
_CHILD_KP = (6, 7, 8, 10, 11, 12, 18, 19, 20, 14, 15, 16, 2, 3, 4)


def hand_axes(joints21: jnp.ndarray, transforms_abs: jnp.ndarray
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """joints21 (B, 21, 3), transforms_abs (B, 16, 4, 4) ->
    (b_axis, u_axis, l_axis), each (B, 15, 3), unit, world-space."""
    j = jnp.asarray(_JOINT_KP)
    c = jnp.asarray(_CHILD_KP)
    b = joints21[:, c] - joints21[:, j]  # (B, 15, 3) bone vectors
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-8)

    # palm-up reference: the parent frame's +z column rotated into world
    # (MANO rest pose has the back of the hand facing +z)
    parent_rot = transforms_abs[:, 1:, :3, :3]  # (B, 15, 3, 3) joint frames
    up_ref = parent_rot[..., :, 2]  # (B, 15, 3)

    l = jnp.cross(up_ref, b)
    l = l / jnp.maximum(jnp.linalg.norm(l, axis=-1, keepdims=True), 1e-8)
    u = jnp.cross(b, l)
    u = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-8)
    return b, u, l
