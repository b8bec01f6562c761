"""Quaternion helpers for observation assembly.

Reference counterpart: pybullet's `getBasePositionAndOrientation` returns
(pos, quat) per body in (x, y, z, w) order; `bullet_cartpole.py` stacks them
into the low-dim observation and derives the pole tilt from the quaternion
for the termination check. Here the minimal-coordinate state is primary and
quaternions are derived, branch-free.
"""

from __future__ import annotations

import jax.numpy as jnp


def pole_quaternion(sx, sy, w):
    """Minimal-twist rotation taking +z to the pole direction u = (sx, sy, w).

    Axis = z x u / |z x u| = (-sy, sx, 0)/|s|; using half-angle identities the
    normalization cancels:  q_xyz = (-sy, sx, 0) / sqrt(2(1+w)),
    q_w = sqrt((1+w)/2).  Smooth everywhere with w > -1 (w is clamped to
    w_min > 0 upstream). Returned in pybullet (x, y, z, w) order.
    """
    inv = 1.0 / jnp.sqrt(2.0 * (1.0 + w))
    qx = -sy * inv
    qy = sx * inv
    qz = jnp.zeros_like(sx)
    qw = jnp.sqrt((1.0 + w) * 0.5)
    return qx, qy, qz, qw


def tilt_angle_from_quat(qx, qy, qz, qw):
    """Inverse of pole_quaternion: the tilt angle encoded by the quaternion."""
    w = 2.0 * qw * qw - 1.0  # cos(theta)
    return jnp.arccos(jnp.clip(w, -1.0, 1.0))
