"""Autodiff-Lagrangian forward dynamics — independent ground truth.

This module re-derives the cart-pole equations of motion *mechanically* from
the 6-line Lagrangian using JAX autodiff (hessian/jacobian), with no
hand-derived algebra. It exists purely to machine-check the closed-form
solver in physics/dynamics.py (tests/test_dynamics.py asserts they agree to
float tolerance on random states), replacing the role that Bullet's
independent C++ solver played for the reference env.

Not a hot path: used only in tests (it does a dense 5x5 solve and builds the
mass matrix via jax.hessian).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .params import CartPoleParams


def lagrangian(p: CartPoleParams, q: jax.Array, qd: jax.Array) -> jax.Array:
    """L(q, qd) for q = (x, y, z, ux, uy). Conservative terms only.

    Contact / friction / actuation enter as generalized forces Q, identically
    in both implementations.
    """
    z = q[2]
    s = q[3:5]
    v = qd[0:3]
    sd = qd[3:5]
    w = jnp.sqrt(1.0 - jnp.sum(s * s))
    udz = -jnp.dot(s, sd) / w
    u3 = jnp.concatenate([sd, udz[None]])
    mt, jc, kg = p.total_mass, p.coupling, p.pole_gen_inertia
    t = 0.5 * mt * jnp.dot(v, v) + jc * jnp.dot(v, u3) + 0.5 * kg * jnp.dot(u3, u3)
    vpot = mt * p.gravity * z + p.pole_mass * p.gravity * p.half_length * w
    return t - vpot


def solve_accel_autodiff(p: CartPoleParams, q: jax.Array, qd: jax.Array,
                         gen_force: jax.Array) -> jax.Array:
    """qdd from M(q) qdd = Q + dL/dq - (d2L/dq dqd) qd, all via autodiff."""
    lag = lambda q_, qd_: lagrangian(p, q_, qd_)
    mass = jax.hessian(lag, argnums=1)(q, qd)
    dl_dq = jax.grad(lag, argnums=0)(q, qd)
    # Coriolis/centrifugal: d/dt(dL/dqd) contribution from q moving: (d2L/dq dqd) qd
    mixed = jax.jacfwd(jax.grad(lag, argnums=1), argnums=0)(q, qd)
    rhs = gen_force + dl_dq - mixed @ qd
    return jnp.linalg.solve(mass, rhs)
