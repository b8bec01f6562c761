"""Pallas fused-rollout kernel parity tests (interpret mode on CPU).

SURVEY.md §7 stage 3: the Pallas kernel must be the bitwise(-ish) twin of
the public env.step path — same physics, same counter-PRNG streams, same
termination/reset logic. These tests run the kernel in the Pallas
interpreter against `reference_rollout` (XLA scan over env.step) with the
identical benchmark action stream.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cartpoleplusplus_tpu import CartPole3D, CartPoleParams
from cartpoleplusplus_tpu.ops.fused_rollout import (
    pallas_rollout,
    reference_rollout,
)
from cartpoleplusplus_tpu.physics.params import continuous_params

B = 1024  # minimum kernel batch: 8 sublanes x 128 lanes


def _run_both(params, num_steps):
    env = CartPole3D(params, num_envs=B)
    state0, _ = jax.jit(env.reset)(7)
    # Separate copies: both paths donate their input.
    state_a = jax.tree.map(jnp.copy, state0)
    state_b = jax.tree.map(jnp.copy, state0)
    k_state, k_acc = pallas_rollout(env, num_steps, interpret=True)(state_a)
    r_state, r_acc = reference_rollout(env, num_steps)(state_b)
    return k_state, float(k_acc), r_state, float(r_acc)


@pytest.mark.parametrize("params", [
    CartPoleParams(),                      # discrete, +1 reward
    continuous_params(),                   # continuous, pushes, shaped
], ids=["discrete", "continuous"])
def test_kernel_matches_env_step(params):
    k_state, k_acc, r_state, r_acc = _run_both(params, num_steps=25)
    # Physical state: identical math modulo association order -> tight rtol.
    np.testing.assert_allclose(np.asarray(k_state.phys.pos),
                               np.asarray(r_state.phys.pos),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(k_state.phys.s),
                               np.asarray(r_state.phys.s),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(k_state.phys.vel),
                               np.asarray(r_state.phys.vel),
                               rtol=5e-4, atol=5e-4)
    # Episode bookkeeping must be EXACT (resets happened at the same steps).
    np.testing.assert_array_equal(np.asarray(k_state.steps),
                                  np.asarray(r_state.steps))
    np.testing.assert_array_equal(np.asarray(k_state.episode),
                                  np.asarray(r_state.episode))
    # Checksum (all obs components + rewards) agrees to fp32 reduction tol.
    assert abs(k_acc - r_acc) / max(abs(r_acc), 1.0) < 1e-4


def test_kernel_episodes_progress():
    """Sanity: over 60 steps of random actions many envs terminate and
    restart (auto-reset inside the kernel works)."""
    k_state, _, _, _ = _run_both(CartPoleParams(), num_steps=60)
    assert int(jnp.sum(k_state.episode)) > B // 4


def test_bad_batch_size_rejected():
    env = CartPole3D(CartPoleParams(), num_envs=100)
    with pytest.raises(ValueError):
        pallas_rollout(env, 4)
