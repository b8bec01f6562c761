"""Numerical-guard tests (SURVEY.md §5 sanitizer row)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cartpoleplusplus_tpu import CartPole3D, CartPoleParams
from cartpoleplusplus_tpu.utils.checks import (
    assert_finite_tree,
    checked_step,
)


def test_checked_step_clean_run():
    env = CartPole3D(CartPoleParams(), num_envs=4)
    state, _ = jax.jit(env.reset)(0)
    step = checked_step(env)
    for t in range(3):
        err, (state, obs, reward, done, info) = step(
            state, jnp.zeros((4,), jnp.int32))
        err.throw()  # no error on healthy trajectories
    assert np.all(np.isfinite(np.asarray(obs)))


def test_checked_step_catches_corruption():
    env = CartPole3D(CartPoleParams(), num_envs=4)
    state, _ = jax.jit(env.reset)(0)
    bad = state._replace(phys=state.phys._replace(
        pos=state.phys.pos.at[0, 0].set(jnp.nan)))
    err, _ = checked_step(env)(bad, jnp.zeros((4,), jnp.int32))
    with pytest.raises(Exception, match="non-finite"):
        err.throw()


def test_assert_finite_tree():
    assert_finite_tree({"a": jnp.ones(3)}, "ok")
    with pytest.raises(FloatingPointError, match="bad"):
        assert_finite_tree({"x": jnp.array([1.0, jnp.inf])}, "bad")


def test_fuzzed_states_stay_finite():
    """Robustness fuzz: stepping from random states across the whole
    reachable chart (|s| < s_norm_max, velocities up to vel_max) never
    produces NaN/Inf — the guard clamps documented in physics/dynamics.py
    hold everywhere, not just on nominal trajectories."""
    from cartpoleplusplus_tpu.env.cartpole import EnvState
    from cartpoleplusplus_tpu.physics import PhysState

    env = CartPole3D(CartPoleParams(), num_envs=256)
    p = env.params
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 6)
    ang = jax.random.uniform(ks[0], (256,), minval=0, maxval=2 * jnp.pi)
    r = jax.random.uniform(ks[1], (256,), minval=0, maxval=p.s_norm_max)
    s = jnp.stack([r * jnp.cos(ang), r * jnp.sin(ang)], -1)
    phys = PhysState(
        pos=jax.random.uniform(ks[2], (256, 3), minval=-3.0, maxval=3.0),
        vel=jax.random.uniform(ks[3], (256, 3), minval=-p.vel_max,
                               maxval=p.vel_max),
        s=s,
        sd=jax.random.uniform(ks[4], (256, 2), minval=-p.vel_max,
                              maxval=p.vel_max),
    )
    base, _ = jax.jit(env.reset)(0)
    state = base._replace(phys=phys)
    step = jax.jit(env.step)
    for t in range(100):
        a = jax.random.randint(jax.random.fold_in(ks[5], t), (256,), 0, 5)
        state, obs, reward, done, _ = step(state, a)
    for name, arr in (("pos", state.phys.pos), ("vel", state.phys.vel),
                      ("s", state.phys.s), ("sd", state.phys.sd),
                      ("obs", obs), ("reward", reward)):
        assert np.all(np.isfinite(np.asarray(arr))), name
