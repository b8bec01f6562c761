"""Observation assembly.

Reference counterpart: `bullet_cartpole.py` builds the low-dim observation
by stacking (position, orientation-quaternion) of the cart and pole over the
action-repeat window — poses across time *in lieu of velocities* — via
`pybullet.getBasePositionAndOrientation` after each repeat. Pixel
observations come from `getCameraImage` (see env/pixels.py).

Here the same 14-float frame (cart pos3+quat4, pole COM pos3+quat4, pybullet
(x,y,z,w) quat order) is assembled branch-free from the minimal-coordinate
state on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..physics import CartPoleParams, PhysState, pole_w
from .compute import frame_components

OBS_MODES = ("pose_stack", "state", "pixels")

FRAME_SIZE = 14  # 2 bodies x (pos3 + quat4)


def obs_size(p: CartPoleParams, mode: str) -> int:
    if mode == "pose_stack":
        return p.action_repeats * FRAME_SIZE
    if mode == "state":
        return 10
    raise ValueError(f"obs_size undefined for mode {mode!r}")


def pole_com(p: CartPoleParams, phys: PhysState):
    """Pole COM world position (..., 3)."""
    sx, sy = phys.s[..., 0], phys.s[..., 1]
    w = pole_w(p, sx, sy)
    l = p.half_length
    return jnp.stack(
        [phys.pos[..., 0] + l * sx,
         phys.pos[..., 1] + l * sy,
         phys.pos[..., 2] + p.pivot_height + l * w],
        axis=-1)


def pose_frame(p: CartPoleParams, phys: PhysState) -> jax.Array:
    """One 14-float pose snapshot per env: (..., 14).

    Stack-wrapper over env/compute.py::frame_components — the SAME
    expressions evaluate inside the Pallas kernel's checksum (cart pose +
    identity quaternion: the cart does not rotate in reduced coordinates;
    the reference cart's yaw stays ~0 too since forces pass through its
    COM)."""
    comps = frame_components(p, phys.pos[..., 0], phys.pos[..., 1],
                             phys.pos[..., 2], phys.s[..., 0],
                             phys.s[..., 1])
    return jnp.stack(comps, axis=-1)


def stack_obs(frames) -> jax.Array:
    """Stack R pose frames into the flat (..., R*14) observation."""
    return jnp.concatenate(frames, axis=-1)


def state_obs(p: CartPoleParams, phys: PhysState) -> jax.Array:
    """Raw minimal-coordinate observation (..., 10): pos, vel, s, sd.

    Not present in the reference (which uses pose stacks to avoid velocity
    estimation); provided because direct state obs is the natural choice
    when the simulator is differentiable and on-device.
    """
    return jnp.concatenate([phys.pos, phys.vel, phys.s, phys.sd], axis=-1)
