"""Environment behavior: termination, reward, auto-reset, action-repeat,
observation assembly, and fixed-seed parity with the numpy oracle
(BASELINE config 1/2: single-env CPU reference + batched lockstep)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cartpoleplusplus_tpu import CartPole3D, CartPoleParams, continuous_params
from cartpoleplusplus_tpu.env import (derive_env_seeds, push_randomness,
                                      reset_randomness)
from cartpoleplusplus_tpu.utils import pole_quaternion, tilt_angle_from_quat

from oracle import OracleCartPole3D

P = CartPoleParams()


# ---------------------------------------------------------------- parity ----
@pytest.mark.parametrize("params,name", [
    (CartPoleParams(), "discrete"),
    (continuous_params(), "continuous+pushes"),
])
def test_fixed_seed_parity_with_oracle(params, name):
    """Batched jit env == single-env numpy oracle, per step, fixed seed."""
    b, t = 3, 60
    key = jax.random.PRNGKey(42)
    env = CartPole3D(params, num_envs=b, auto_reset=False)
    state, obs = jax.jit(env.reset)(key)
    step = jax.jit(env.step)

    # Reproduce the env's per-env randomness for the oracle.
    eseeds = derive_env_seeds(key, b)
    oracles = []
    for i in range(b):
        imp = np.asarray(reset_randomness(params, eseeds[i], jnp.int32(0)))
        pushes = {}
        if params.push_prob_per_repeat > 0:
            for s in range(t):
                for r in range(params.action_repeats):
                    pv = np.asarray(push_randomness(
                        params, eseeds[i], jnp.int32(0), jnp.int32(s), r))
                    if np.any(pv != 0):
                        pushes[(s, r)] = (float(pv[0]), float(pv[1]))
        o = OracleCartPole3D(params, imp, pushes)
        oracles.append((o, o.reset()))

    for i, (o, oobs) in enumerate(oracles):
        np.testing.assert_allclose(np.asarray(obs[i]), oobs, atol=1e-5,
                                   err_msg=f"reset obs env {i} ({name})")

    rng = np.random.RandomState(0)
    done_mask = [False] * b
    for s in range(t):
        if params.discrete_actions:
            actions = rng.randint(0, 5, size=b)
            a_dev = jnp.asarray(actions)
        else:
            actions = rng.uniform(-1, 1, size=(b, 2)).astype(np.float32)
            a_dev = jnp.asarray(actions)
        state, obs, rew, done, info = step(state, a_dev)
        for i, (o, _) in enumerate(oracles):
            if done_mask[i]:
                continue
            oo, orew, odone, _ = o.step(actions[i])
            np.testing.assert_allclose(np.asarray(obs[i]), oo, atol=5e-4,
                                       err_msg=f"obs step {s} env {i} ({name})")
            assert abs(float(rew[i]) - orew) < 1e-4, (s, i, name)
            assert bool(done[i]) == odone, (s, i, name)
            done_mask[i] = odone


# ----------------------------------------------------------- termination ----
def make_env(b=4, **kw):
    return CartPole3D(CartPoleParams(), num_envs=b, **kw)


def test_termination_flags():
    env = make_env()
    state, _ = env.reset(jax.random.PRNGKey(0))
    # env 0: tilted; env 1: out of bounds; env 2: fine; env 3: max steps
    s = state.phys.s.at[0].set(jnp.array([0.4, 0.0]))
    pos = state.phys.pos.at[1, 0].set(3.0)
    steps = state.steps.at[3].set(P.max_episode_steps - 1)
    state = state._replace(phys=state.phys._replace(s=s, pos=pos), steps=steps)
    _, _, rew, done, info = jax.jit(env.step)(state, jnp.zeros(4, jnp.int32))
    assert bool(done[0]) and bool(info["tilted"][0])
    assert bool(done[1]) and bool(info["out_of_bounds"][1])
    assert not bool(done[2])
    assert bool(done[3]) and bool(info["truncated"][3])
    # reward: 0 for physical termination, 1 for survival and truncation
    assert float(rew[0]) == 0.0 and float(rew[1]) == 0.0
    assert float(rew[2]) == 1.0 and float(rew[3]) == 1.0


def test_auto_reset():
    env = make_env()
    state, _ = env.reset(jax.random.PRNGKey(0))
    s = state.phys.s.at[0].set(jnp.array([0.4, 0.0]))
    state = state._replace(phys=state.phys._replace(s=s),
                           steps=state.steps + 7)
    new_state, obs, _, done, info = jax.jit(env.step)(state, jnp.zeros(4, jnp.int32))
    assert bool(done[0])
    # env 0 was reset: steps back to 0, episode incremented, pole near upright
    assert int(new_state.steps[0]) == 0
    assert int(new_state.episode[0]) == 1
    assert float(jnp.linalg.norm(new_state.phys.s[0])) < 0.05
    # env 2 kept stepping
    assert int(new_state.steps[2]) == 8
    assert int(new_state.episode[2]) == 0
    # obs for the done env is the post-reset obs (pose of a fresh state),
    # not the tilted terminal obs (which is preserved in info)
    assert float(jnp.linalg.norm(obs[0] - info["terminal_obs"][0])) > 1e-3


def test_auto_reset_uses_fresh_randomness():
    """Consecutive episodes of the same env get different initial pushes."""
    env = CartPole3D(CartPoleParams(), num_envs=2)
    state, _ = env.reset(jax.random.PRNGKey(3))
    v0 = state.phys.sd[0]
    s = state.phys.s.at[0].set(jnp.array([0.4, 0.0]))
    state = state._replace(phys=state.phys._replace(s=s))
    new_state, *_ = jax.jit(env.step)(state, jnp.zeros(2, jnp.int32))
    v1 = new_state.phys.sd[0]
    assert float(jnp.linalg.norm(v0 - v1)) > 1e-5


def test_action_repeat_obs_stack():
    """pose_stack obs = action_repeats frames; frames differ within a step."""
    env = make_env(b=2)
    state, obs = env.reset(jax.random.PRNGKey(1))
    r = P.action_repeats
    frames = np.asarray(obs).reshape(2, r, 14)
    # reset obs repeats the same frame
    for k in range(1, r):
        np.testing.assert_allclose(frames[:, k], frames[:, 0])
    _, obs1, _, _, _ = jax.jit(env.step)(state, jnp.ones(2, jnp.int32))
    frames1 = np.asarray(obs1).reshape(2, r, 14)
    # after a forced step the stacked frames must differ (motion encoded)
    assert np.abs(frames1[:, -1] - frames1[:, 0]).max() > 1e-4


def test_quaternion_roundtrip():
    s = jnp.array([0.25, -0.1])
    w = jnp.sqrt(1 - jnp.sum(s * s))
    q = pole_quaternion(s[0], s[1], w)
    tilt = tilt_angle_from_quat(*q)
    np.testing.assert_allclose(float(tilt), float(jnp.arccos(w)), atol=1e-6)
    # unit norm
    np.testing.assert_allclose(sum(float(c) ** 2 for c in q), 1.0, atol=1e-6)


def test_reset_determinism_independent_of_batch_slot():
    """Env i's stream depends only on (key, global index): growing the batch
    must not change earlier envs (sharding/layout independence)."""
    k = jax.random.PRNGKey(7)
    s4, o4 = CartPole3D(P, num_envs=4).reset(k)
    s8, o8 = CartPole3D(P, num_envs=8).reset(k)
    np.testing.assert_allclose(np.asarray(o4), np.asarray(o8[:4]), atol=0)


def test_rollout_scan():
    env = make_env(b=4)
    state, _ = env.reset(jax.random.PRNGKey(0))

    def policy(obs, key):
        return jax.random.randint(key, (obs.shape[0],), 0, 5)

    state, (obs, act, rew, done) = jax.jit(
        lambda s: env.rollout(s, policy, 50))(state)
    assert obs.shape == (50, 4, env.obs_size)
    assert act.shape == (50, 4)
    assert float(done.sum()) > 0  # random policy must fail sometimes
    assert bool(jnp.all(jnp.isfinite(obs)))
