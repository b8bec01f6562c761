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
