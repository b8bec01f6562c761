"""Parity tests for the fused DDPG update-phase kernel (ops/learner_kernel).

Three layers of pinning, strongest anchor first:
  1. `update_phase_math` (the kernel's componentwise jnp twin) must
     reproduce agents/ddpg.py::_update_once's XLA scan — same params,
     moments, targets and losses after K sequential updates. This
     cross-checks the hand-written feature-major backward pass against
     jax.grad and the hand-written Adam against optax.adam.
  2. Block-split invariance: accumulating gradients over batch blocks
     (the kernel grid's NB axis) must match the single-block result.
  3. The Pallas kernel in interpret mode must match the twin bitwise-ish
     (same math, kernel ref plumbing).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cartpoleplusplus_tpu import CartPole3D
from cartpoleplusplus_tpu.agents import DDPG, DDPGConfig
from cartpoleplusplus_tpu.ops import learner_kernel as lk
from cartpoleplusplus_tpu.physics.params import continuous_params

HIDDEN = (32, 24)   # unequal sizes catch transposition bugs
K = 3
BM = 64


def _agent():
    env = CartPole3D(continuous_params(), num_envs=8)
    cfg = DDPGConfig(hidden=HIDDEN, batch_size=BM, actor_lr=1e-3,
                     critic_lr=2e-3, tau=0.05, updates_per_step=K)
    return DDPG(env, cfg)


def _fake_batches(key, obs_dim, k=K, bm=BM):
    ks = jax.random.split(key, 5)
    obs = jax.random.normal(ks[0], (k, bm, obs_dim)) * 0.3
    act = jax.random.uniform(ks[1], (k, bm, 2), minval=-1.0, maxval=1.0)
    rew = jax.random.uniform(ks[2], (k, bm))
    nobs = obs + 0.05 * jax.random.normal(ks[3], (k, bm, obs_dim))
    done = jax.random.bernoulli(ks[4], 0.1, (k, bm))
    return obs, act, rew, nobs, done


def _flatten_state(agent, st):
    h = agent.cfg.hidden
    return dict(
        actor=lk.flatten_actor(st.actor, h),
        critic=lk.flatten_critic(st.critic, h),
        actor_t=lk.flatten_actor(st.actor_target, h),
        critic_t=lk.flatten_critic(st.critic_target, h),
        m_a=lk.flatten_actor(st.actor_opt[0].mu, h),
        v_a=lk.flatten_actor(st.actor_opt[0].nu, h),
        m_c=lk.flatten_critic(st.critic_opt[0].mu, h),
        v_c=lk.flatten_critic(st.critic_opt[0].nu, h),
        t0=st.actor_opt[0].count,
    )


def _assert_tree_close(a, b, **kw):
    ja, jb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(ja) == len(jb)
    for x, y in zip(ja, jb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), **kw)


def test_flatten_roundtrip():
    agent = _agent()
    st = agent.init(0)
    h = agent.cfg.hidden
    _assert_tree_close(
        lk.unflatten_actor(lk.flatten_actor(st.actor, h), h), st.actor)
    _assert_tree_close(
        lk.unflatten_critic(lk.flatten_critic(st.critic, h), h),
        st.critic)


def test_update_math_matches_xla_update_scan():
    agent = _agent()
    st = agent.init(0)
    batches = _fake_batches(jax.random.PRNGKey(1), agent.env.obs_shape[0])

    # --- XLA reference: the production per-update path, K times --------
    st_x = st
    closs, aloss = [], []
    for k in range(K):
        st_x, m = jax.jit(agent._update_once)(
            st_x, tuple(x[k] for x in batches))
        closs.append(m["critic_loss"])
        aloss.append(m["actor_loss"])

    # --- componentwise twin -------------------------------------------
    f = _flatten_state(agent, st)
    run = jax.jit(lambda f, b: lk.update_phase_math(
        f["actor"], f["critic"], f["actor_t"], f["critic_t"],
        f["m_a"], f["v_a"], f["m_c"], f["v_c"], b, f["t0"], HIDDEN,
        actor_lr=agent.cfg.actor_lr, critic_lr=agent.cfg.critic_lr,
        gamma=agent.cfg.gamma, tau=agent.cfg.tau))
    out = run(f, batches)
    actor, critic, actor_t, critic_t, m_a, v_a, m_c, v_c, cl, al = out

    tol = dict(rtol=1e-4, atol=2e-5)
    _assert_tree_close(lk.unflatten_actor(actor, HIDDEN), st_x.actor,
                       **tol)
    _assert_tree_close(lk.unflatten_critic(critic, HIDDEN), st_x.critic,
                       **tol)
    _assert_tree_close(lk.unflatten_actor(actor_t, HIDDEN),
                       st_x.actor_target, **tol)
    _assert_tree_close(lk.unflatten_critic(critic_t, HIDDEN),
                       st_x.critic_target, **tol)
    _assert_tree_close(lk.unflatten_critic(m_c, HIDDEN),
                       st_x.critic_opt[0].mu, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cl), np.asarray(closs), **tol)
    np.testing.assert_allclose(np.asarray(al), np.asarray(aloss), **tol)

    # --- second phase continues from nonzero moments / t0 > 0 ----------
    batches2 = _fake_batches(jax.random.PRNGKey(2), agent.env.obs_shape[0])
    for k in range(K):
        st_x, _ = jax.jit(agent._update_once)(
            st_x, tuple(x[k] for x in batches2))
    f2 = dict(f, actor=actor, critic=critic, actor_t=actor_t,
              critic_t=critic_t, m_a=m_a, v_a=v_a, m_c=m_c, v_c=v_c,
              t0=f["t0"] + K)
    out2 = run(f2, batches2)
    _assert_tree_close(lk.unflatten_actor(out2[0], HIDDEN), st_x.actor,
                       **tol)
    _assert_tree_close(lk.unflatten_critic(out2[1], HIDDEN), st_x.critic,
                       **tol)


def test_update_math_block_split_invariance():
    agent = _agent()
    st = agent.init(0)
    batches = _fake_batches(jax.random.PRNGKey(3), agent.env.obs_shape[0])
    f = _flatten_state(agent, st)

    def run(nb):
        return lk.update_phase_math(
            f["actor"], f["critic"], f["actor_t"], f["critic_t"],
            f["m_a"], f["v_a"], f["m_c"], f["v_c"], batches, f["t0"],
            HIDDEN, actor_lr=agent.cfg.actor_lr,
            critic_lr=agent.cfg.critic_lr, gamma=agent.cfg.gamma,
            tau=agent.cfg.tau, num_blocks=nb)

    one, two = jax.jit(lambda: run(1))(), jax.jit(lambda: run(2))()
    for a, b in zip(jax.tree.leaves(one), jax.tree.leaves(two)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_train_step_kernel_learner_matches_xla_learner():
    """Full train_step parity: a kernel-mode agent (flat-layout state,
    fused update kernel) must reproduce the XLA agent's update scan —
    same rng splits -> bitwise-identical presampled batches; differences
    bounded by summation order only. Also covers the flat<->tree state
    layout converters the checkpoint boundary uses."""
    cfg = dict(hidden=(32, 32), batch_size=64, rollout_steps=8,
               updates_per_step=2, warmup_env_steps=8, learner_block=32)
    env = CartPole3D(continuous_params(), num_envs=64)
    ag_x = DDPG(env, DDPGConfig(learner="xla", **cfg))
    ag_k = DDPG(env, DDPGConfig(learner="kernel", **cfg))
    assert not ag_x.kernel_mode and ag_k.kernel_mode
    st_x, st_k = ag_x.init(0), ag_k.init(0)
    assert isinstance(st_k.actor, (list, tuple))  # kernel-flat layout
    # Same weights at init: flat state is a relayout of the tree state.
    _assert_tree_close(ag_k.state_to_tree(st_k).actor, st_x.actor)
    ts_x = ag_x.make_train_step(fused=False)
    ts_k = ag_k.make_train_step(fused=False)
    for _ in range(4):
        st_x, m_x = ts_x(st_x)
        st_k, m_k = ts_k(st_k)
    tree_k = ag_k.state_to_tree(st_k)
    tol = dict(rtol=2e-4, atol=1e-5)
    for name in ("actor", "critic", "actor_target", "critic_target"):
        _assert_tree_close(getattr(tree_k, name), getattr(st_x, name),
                           **tol)
    assert int(st_k.actor_opt[0].count) == int(st_x.actor_opt[0].count)
    _assert_tree_close(tree_k.actor_opt[0].mu, st_x.actor_opt[0].mu,
                       rtol=2e-4, atol=1e-7)
    for key in ("critic_loss", "actor_loss", "reward_mean", "done_frac"):
        np.testing.assert_allclose(np.asarray(m_k[key]),
                                   np.asarray(m_x[key]), **tol)
    # Layout roundtrip: tree -> flat -> tree is exact.
    rt = ag_k.state_to_tree(ag_k.state_from_tree(tree_k))
    _assert_tree_close(rt.actor, tree_k.actor)
    _assert_tree_close(rt.critic_opt[0].nu, tree_k.critic_opt[0].nu)
    # Eval works directly on the flat-layout state.
    stats = jax.jit(lambda s: ag_k.evaluate(s, num_steps=16))(st_k)
    assert np.isfinite(float(stats["reward_mean"]))


def test_kernel_learner_rejects_uncovered_config():
    env = CartPole3D(continuous_params(), num_envs=8)
    with pytest.raises(ValueError):
        DDPG(env, DDPGConfig(hidden=(16, 16), batch_size=16,
                             polyak_cadence="per_step", learner="kernel"))
    agent = DDPG(env, DDPGConfig(hidden=(16, 16), batch_size=16,
                                 polyak_cadence="per_step"))
    assert not agent.kernel_learner_ok() and not agent.kernel_mode


def test_train_step_kernel_learner_pre_mode_matches_xla():
    """The merged single-phase kernel (actor_grad_critic='pre': both
    gradients from the same critic, one grid phase per update) must
    match the XLA agent configured with the same knob."""
    cfg = dict(hidden=(32, 32), batch_size=64, rollout_steps=8,
               updates_per_step=2, warmup_env_steps=8, learner_block=32,
               actor_grad_critic="pre")
    env = CartPole3D(continuous_params(), num_envs=64)
    ag_x = DDPG(env, DDPGConfig(learner="xla", **cfg))
    ag_k = DDPG(env, DDPGConfig(learner="kernel", **cfg))
    st_x, st_k = ag_x.init(0), ag_k.init(0)
    ts_x = ag_x.make_train_step(fused=False)
    ts_k = ag_k.make_train_step(fused=False)
    for _ in range(4):
        st_x, m_x = ts_x(st_x)
        st_k, m_k = ts_k(st_k)
    tree_k = ag_k.state_to_tree(st_k)
    tol = dict(rtol=2e-4, atol=1e-5)
    for name in ("actor", "critic", "actor_target", "critic_target"):
        _assert_tree_close(getattr(tree_k, name), getattr(st_x, name),
                           **tol)
    for key in ("critic_loss", "actor_loss"):
        np.testing.assert_allclose(np.asarray(m_k[key]),
                                   np.asarray(m_x[key]), **tol)


def test_kernel_interpret_matches_math_twin():
    """The pallas_call (interpret mode) against the componentwise twin:
    same math through the kernel's ref plumbing, grid phases and block
    accumulation — near-bitwise."""
    agent = _agent()
    st = agent.init(0)
    obs_dim = agent.env.obs_shape[0]
    batches = _fake_batches(jax.random.PRNGKey(4), obs_dim)
    f = _flatten_state(agent, st)
    groups = (f["actor"], f["critic"], f["actor_t"], f["critic_t"],
              f["m_a"], f["v_a"], f["m_c"], f["v_c"])
    blk = 32
    run = lk.ddpg_update_phase(
        HIDDEN, obs_dim, K, BM, actor_lr=agent.cfg.actor_lr,
        critic_lr=agent.cfg.critic_lr, gamma=agent.cfg.gamma,
        tau=agent.cfg.tau, block_size=blk, interpret=True)
    new_groups, closs, aloss = jax.jit(run)(groups, batches, f["t0"])

    want = jax.jit(functools.partial(
        lk.update_phase_math, hidden=HIDDEN, actor_lr=agent.cfg.actor_lr,
        critic_lr=agent.cfg.critic_lr, gamma=agent.cfg.gamma,
        tau=agent.cfg.tau, num_blocks=BM // blk))(
            f["actor"], f["critic"], f["actor_t"], f["critic_t"],
            f["m_a"], f["v_a"], f["m_c"], f["v_c"], batches, f["t0"])
    tol = dict(rtol=1e-5, atol=1e-7)
    for got_g, want_g in zip(new_groups, want[:8]):
        _assert_tree_close(got_g, want_g, **tol)
    np.testing.assert_allclose(np.asarray(closs), np.asarray(want[8]),
                               **tol)
    np.testing.assert_allclose(np.asarray(aloss), np.asarray(want[9]),
                               **tol)


# --------------------------------------------------------------------------
# DQN fused update phase
# --------------------------------------------------------------------------

from cartpoleplusplus_tpu import CartPoleParams
from cartpoleplusplus_tpu.agents import DQN, DQNConfig


def _dqn_agent(**kw):
    env = CartPole3D(CartPoleParams(), num_envs=8)
    cfg = DQNConfig(hidden=HIDDEN, batch_size=BM, lr=1e-3, tau=0.05,
                    updates_per_step=K, **kw)
    return DQN(env, cfg)


def _dqn_batches(key, obs_dim, k=K, bm=BM):
    ks = jax.random.split(key, 5)
    obs = jax.random.normal(ks[0], (k, bm, obs_dim)) * 0.3
    act = jax.random.randint(ks[1], (k, bm), 0, 5)
    rew = jax.random.uniform(ks[2], (k, bm))
    nobs = obs + 0.05 * jax.random.normal(ks[3], (k, bm, obs_dim))
    done = jax.random.bernoulli(ks[4], 0.1, (k, bm))
    return obs, act, rew, nobs, done


@pytest.mark.parametrize("double", [True, False])
def test_dqn_update_math_matches_xla_update_scan(double):
    agent = _dqn_agent(double_dqn=double)
    st = agent.init(0)
    batches = _dqn_batches(jax.random.PRNGKey(1), agent.env.obs_shape[0])

    # XLA reference: the production upd_body, K times.
    import optax
    from cartpoleplusplus_tpu.models import polyak as tree_polyak
    q, qt, opt = st.q, st.q_target, st.opt
    losses = []
    for k in range(K):
        batch = tuple(x[k] for x in batches)

        def step(q, qt, opt, batch):
            loss, grad = jax.value_and_grad(agent._loss)(q, qt, batch)
            upd, opt = agent.tx.update(grad, opt, q)
            q = optax.apply_updates(q, upd)
            return q, tree_polyak(qt, q, agent.cfg.tau), opt, loss

        q, qt, opt, loss = jax.jit(step)(q, qt, opt, batch)
        losses.append(loss)

    h = agent.cfg.hidden
    f_q = lk.flatten_actor(st.q, h)
    f_qt = lk.flatten_actor(st.q_target, h)
    f_m = lk.flatten_actor(st.opt[0].mu, h)
    f_v = lk.flatten_actor(st.opt[0].nu, h)
    out = jax.jit(functools.partial(
        lk.dqn_update_phase_math, hidden=HIDDEN, lr=agent.cfg.lr,
        gamma=agent.cfg.gamma, tau=agent.cfg.tau,
        double_dqn=double))(f_q, f_qt, f_m, f_v, batches, st.opt[0].count)
    tol = dict(rtol=1e-4, atol=2e-5)
    _assert_tree_close(lk.unflatten_actor(out[0], HIDDEN, action_dim=5),
                       q, **tol)
    _assert_tree_close(lk.unflatten_actor(out[1], HIDDEN, action_dim=5),
                       qt, **tol)
    np.testing.assert_allclose(np.asarray(out[4]), np.asarray(losses),
                               **tol)


def test_dqn_kernel_interpret_matches_math_twin():
    agent = _dqn_agent()
    st = agent.init(0)
    obs_dim = agent.env.obs_shape[0]
    batches = _dqn_batches(jax.random.PRNGKey(2), obs_dim)
    h = agent.cfg.hidden
    groups = (lk.flatten_actor(st.q, h), lk.flatten_actor(st.q_target, h),
              lk.flatten_actor(st.opt[0].mu, h),
              lk.flatten_actor(st.opt[0].nu, h))
    blk = 32
    run = lk.dqn_update_phase(HIDDEN, obs_dim, K, BM, lr=agent.cfg.lr,
                              gamma=agent.cfg.gamma, tau=agent.cfg.tau,
                              block_size=blk, interpret=True)
    new_groups, loss = jax.jit(run)(groups, batches, st.opt[0].count)
    want = jax.jit(functools.partial(
        lk.dqn_update_phase_math, hidden=HIDDEN, lr=agent.cfg.lr,
        gamma=agent.cfg.gamma, tau=agent.cfg.tau,
        num_blocks=BM // blk))(*groups, batches, st.opt[0].count)
    tol = dict(rtol=1e-5, atol=1e-7)
    for got_g, want_g in zip(new_groups, want[:4]):
        _assert_tree_close(got_g, want_g, **tol)
    np.testing.assert_allclose(np.asarray(loss), np.asarray(want[4]),
                               **tol)


def test_dqn_train_step_kernel_learner_matches_xla_learner():
    """Full DQN train_step parity: kernel-mode agent (flat state, fused
    update kernel) vs the XLA agent, same seed."""
    cfg = dict(hidden=(32, 32), batch_size=64, rollout_steps=8,
               updates_per_step=2, warmup_env_steps=8, learner_block=32,
               eps_decay_env_steps=100)
    env = CartPole3D(CartPoleParams(), num_envs=64)
    ag_x = DQN(env, DQNConfig(learner="xla", **cfg))
    ag_k = DQN(env, DQNConfig(learner="kernel", **cfg))
    assert not ag_x.kernel_mode and ag_k.kernel_mode
    st_x, st_k = ag_x.init(0), ag_k.init(0)
    assert isinstance(st_k.q, (list, tuple))
    ts_x = ag_x.make_train_step(fused=False)
    ts_k = ag_k.make_train_step(fused=False)
    for _ in range(4):
        st_x, m_x = ts_x(st_x)
        st_k, m_k = ts_k(st_k)
    tree_k = ag_k.state_to_tree(st_k)
    tol = dict(rtol=2e-4, atol=1e-5)
    _assert_tree_close(tree_k.q, st_x.q, **tol)
    _assert_tree_close(tree_k.q_target, st_x.q_target, **tol)
    assert int(st_k.opt[0].count) == int(st_x.opt[0].count)
    for key in ("loss", "reward_mean", "done_frac"):
        np.testing.assert_allclose(np.asarray(m_k[key]),
                                   np.asarray(m_x[key]), **tol)
    # Greedy eval works on the flat state.
    stats = jax.jit(lambda s: ag_k.evaluate(s, num_steps=16))(st_k)
    assert np.isfinite(float(stats["reward_mean"]))


# --------------------------------------------------------------------------
# NAF fused update phase
# --------------------------------------------------------------------------

from cartpoleplusplus_tpu.agents import NAF, NAFConfig


def _naf_agent(**kw):
    env = CartPole3D(continuous_params(), num_envs=8)
    cfg = NAFConfig(hidden=HIDDEN, batch_size=BM, lr=1e-3, tau=0.05,
                    updates_per_step=K, **kw)
    return NAF(env, cfg)


@pytest.mark.parametrize("clip", [10.0, 0.0])
def test_naf_update_math_matches_xla_update_scan(clip):
    agent = _naf_agent(max_grad_norm=clip)
    st = agent.init(0)
    batches = _fake_batches(jax.random.PRNGKey(1), agent.env.obs_shape[0])

    import optax
    from cartpoleplusplus_tpu.models import polyak as tree_polyak
    params, target, opt = st.params, st.target, st.opt
    losses = []
    for k in range(K):
        batch = tuple(x[k] for x in batches)

        def step(params, target, opt, batch):
            loss, grad = jax.value_and_grad(agent._loss)(
                params, target, batch)
            upd, opt = agent.tx.update(grad, opt, params)
            params = optax.apply_updates(params, upd)
            return params, tree_polyak(target, params, agent.cfg.tau), \
                opt, loss

        params, target, opt, loss = jax.jit(step)(params, target, opt,
                                                  batch)
        losses.append(loss)

    h = agent.cfg.hidden
    a0 = agent._adam_state(st.opt)
    out = jax.jit(functools.partial(
        lk.naf_update_phase_math, hidden=HIDDEN, lr=agent.cfg.lr,
        gamma=agent.cfg.gamma, tau=agent.cfg.tau, max_grad_norm=clip))(
            lk.flatten_naf(st.params, h), lk.flatten_naf(st.target, h),
            lk.flatten_naf(a0.mu, h), lk.flatten_naf(a0.nu, h),
            batches, a0.count)
    tol = dict(rtol=2e-4, atol=2e-5)
    _assert_tree_close(lk.unflatten_naf(out[0], HIDDEN), params, **tol)
    _assert_tree_close(lk.unflatten_naf(out[1], HIDDEN), target, **tol)
    np.testing.assert_allclose(np.asarray(out[4]), np.asarray(losses),
                               **tol)


def test_naf_flatten_roundtrip_and_kernel_interpret():
    agent = _naf_agent()
    st = agent.init(0)
    h = agent.cfg.hidden
    _assert_tree_close(
        lk.unflatten_naf(lk.flatten_naf(st.params, h), h), st.params)

    obs_dim = agent.env.obs_shape[0]
    batches = _fake_batches(jax.random.PRNGKey(2), obs_dim)
    a0 = agent._adam_state(st.opt)
    groups = (lk.flatten_naf(st.params, h), lk.flatten_naf(st.target, h),
              lk.flatten_naf(a0.mu, h), lk.flatten_naf(a0.nu, h))
    blk = 32
    run = lk.naf_update_phase(HIDDEN, obs_dim, K, BM, lr=agent.cfg.lr,
                              gamma=agent.cfg.gamma, tau=agent.cfg.tau,
                              max_grad_norm=agent.cfg.max_grad_norm,
                              block_size=blk, interpret=True)
    new_groups, loss = jax.jit(run)(groups, batches, a0.count)
    want = jax.jit(functools.partial(
        lk.naf_update_phase_math, hidden=HIDDEN, lr=agent.cfg.lr,
        gamma=agent.cfg.gamma, tau=agent.cfg.tau,
        max_grad_norm=agent.cfg.max_grad_norm,
        num_blocks=BM // blk))(*groups, batches, a0.count)
    tol = dict(rtol=1e-5, atol=1e-7)
    for got_g, want_g in zip(new_groups, want[:4]):
        _assert_tree_close(got_g, want_g, **tol)
    np.testing.assert_allclose(np.asarray(loss), np.asarray(want[4]),
                               **tol)


def test_naf_train_step_kernel_learner_matches_xla_learner():
    cfg = dict(hidden=(32, 32), batch_size=64, rollout_steps=8,
               updates_per_step=2, warmup_env_steps=8, learner_block=32)
    env = CartPole3D(continuous_params(), num_envs=64)
    ag_x = NAF(env, NAFConfig(learner="xla", **cfg))
    ag_k = NAF(env, NAFConfig(learner="kernel", **cfg))
    assert not ag_x.kernel_mode and ag_k.kernel_mode
    st_x, st_k = ag_x.init(0), ag_k.init(0)
    assert isinstance(st_k.params, (list, tuple))
    ts_x = ag_x.make_train_step(fused=False)
    ts_k = ag_k.make_train_step(fused=False)
    for _ in range(4):
        st_x, m_x = ts_x(st_x)
        st_k, m_k = ts_k(st_k)
    tree_k = ag_k.state_to_tree(st_k)
    tol = dict(rtol=2e-4, atol=1e-5)
    _assert_tree_close(tree_k.params, st_x.params, **tol)
    _assert_tree_close(tree_k.target, st_x.target, **tol)
    for key in ("loss", "reward_mean", "done_frac"):
        np.testing.assert_allclose(np.asarray(m_k[key]),
                                   np.asarray(m_x[key]), **tol)
    stats = jax.jit(lambda s: ag_k.evaluate(s, num_steps=16))(st_k)
    assert np.isfinite(float(stats["reward_mean"]))


def test_kernel_mode_under_shard_map_axis():
    """The kernel learner composes with shard_map via batch replication
    (gather_batches all_gathers the per-shard minibatches): explicit
    learner='kernel' is accepted with dist_axis set whenever the global
    batch splits evenly into sublane-aligned per-shard draws, and the
    kernel consumes the GLOBAL batch. Uneven splits stay rejected."""
    env = CartPole3D(continuous_params(), num_envs=16)
    ag = DDPG(env, DDPGConfig(hidden=(16, 16), batch_size=16,
                              learner="kernel"),
              dist_axis="data", num_shards=2)
    assert ag.kernel_mode
    assert ag.local_batch_size == 8
    assert ag._kernel_batch_size == 16
    # Per-shard minibatch must stay sublane-aligned (8 rows): 16/3 and
    # 16-over-4 (4 rows/shard) both fall outside the kernel window.
    with pytest.raises(ValueError):
        DDPG(env, DDPGConfig(hidden=(16, 16), batch_size=16,
                             learner="kernel"),
             dist_axis="data", num_shards=4)


def test_fused_rollout_accepts_kernel_flat_actor_params():
    """The policy_rollout feature-major flatten must produce identical
    operands from the kernel-mode flat layout and from the flax tree —
    this is the path kernel-mode DDPG's fused rollout takes on TPU."""
    from cartpoleplusplus_tpu.ops.policy_rollout import (
        _flatten_actor_params, _flatten_naf_params)

    agent = _agent()
    st = agent.init(0)
    h = agent.cfg.hidden
    tree_ops = _flatten_actor_params(st.actor, h)
    flat_ops = _flatten_actor_params(lk.flatten_actor(st.actor, h), h)
    _assert_tree_close(flat_ops, tree_ops)

    naf = _naf_agent()
    stn = naf.init(0)
    tree_ops = _flatten_naf_params(stn.params, h)
    flat_ops = _flatten_naf_params(lk.flatten_naf(stn.params, h), h)
    _assert_tree_close(flat_ops, tree_ops)

    from cartpoleplusplus_tpu.ops.policy_rollout import _flatten_q_params
    dqn = _dqn_agent()
    std = dqn.init(0)
    tree_ops = _flatten_q_params(std.q, h)
    flat_ops = _flatten_q_params(lk.flatten_actor(std.q, h), h)
    _assert_tree_close(flat_ops, tree_ops)


def test_kernel_learner_bf16_precision_stays_close():
    """learner_precision='bfloat16' (one MXU pass per in-kernel dot on
    hardware) must keep the kernel learner within bf16-mantissa distance
    of the f32 XLA scan over a few train steps — the knob changes dot
    rounding, never the update algebra. On CPU interpret the precision
    hint is advisory (may be a no-op), so the tolerance is an upper
    bound; the test's real job is exercising the config plumbing end to
    end and catching any NaN/shape break in the bf16 trace path."""
    cfg = dict(hidden=(32, 32), batch_size=64, rollout_steps=8,
               updates_per_step=2, warmup_env_steps=8, learner_block=32)
    env = CartPole3D(continuous_params(), num_envs=64)
    ag_x = DDPG(env, DDPGConfig(learner="xla", **cfg))
    ag_k = DDPG(env, DDPGConfig(learner="kernel",
                                learner_precision="bfloat16", **cfg))
    st_x, st_k = ag_x.init(0), ag_k.init(0)
    ts_x = ag_x.make_train_step(fused=False)
    ts_k = ag_k.make_train_step(fused=False)
    for _ in range(4):
        st_x, m_x = ts_x(st_x)
        st_k, m_k = ts_k(st_k)
    tree_k = ag_k.state_to_tree(st_k)
    tol = dict(rtol=2e-2, atol=2e-3)  # bf16 has ~8 mantissa bits
    for name in ("actor", "critic", "actor_target", "critic_target"):
        _assert_tree_close(getattr(tree_k, name), getattr(st_x, name),
                           **tol)
    for key in ("critic_loss", "actor_loss", "reward_mean"):
        v = float(np.asarray(m_k[key]))
        assert np.isfinite(v)
        np.testing.assert_allclose(v, float(np.asarray(m_x[key])), **tol)


# --------------------------------------------------------------------------
# LRPG fused update phase
# --------------------------------------------------------------------------

from cartpoleplusplus_tpu.agents import LRPG, LRPGConfig

# Interpret-mode kernel parity: every test compiles a Pallas kernel on
# CPU — the most compile-heavy file in the suite (slow tier).
pytestmark = pytest.mark.slow

N_ROWS = 128  # rollout window rows (T * B) for the synthetic tests


def _lrpg_agent(**kw):
    env = CartPole3D(CartPoleParams(), num_envs=8)
    cfg = LRPGConfig(hidden=HIDDEN, lr=1e-3, **kw)
    return LRPG(env, cfg)


def _lrpg_window(key, obs_dim, n=N_ROWS, num_actions=5):
    ks = jax.random.split(key, 3)
    obs = jax.random.normal(ks[0], (n, obs_dim)) * 0.3
    act = jax.random.randint(ks[1], (n,), 0, num_actions)
    adv = jax.random.normal(ks[2], (n,))
    return obs, act, adv


def test_lrpg_math_twin_matches_jax_grad_optax():
    """lrpg_update_phase_math (closed-form softmax gradient + Adam) must
    reproduce jax.grad(agent._loss) + optax.adam exactly — the anchor
    that pins the hand-derived dlogits (pg + entropy) against autodiff."""
    import optax

    agent = _lrpg_agent()
    st = agent.init(0)
    obs, act, adv = _lrpg_window(jax.random.PRNGKey(5),
                                 agent.env.obs_shape[0])
    loss_ref, grad = jax.value_and_grad(agent._loss)(st.params, obs,
                                                     act, adv)
    upd, opt2 = agent.tx.update(grad, st.opt, st.params)
    p_ref = optax.apply_updates(st.params, upd)

    h = agent.cfg.hidden
    out = jax.jit(functools.partial(
        lk.lrpg_update_phase_math, hidden=HIDDEN, lr=agent.cfg.lr,
        entropy_coef=agent.cfg.entropy_coef, num_actions=5,
        num_blocks=4))(
            lk.flatten_actor(st.params, h),
            lk.flatten_actor(st.opt[0].mu, h),
            lk.flatten_actor(st.opt[0].nu, h),
            (obs, act, adv), st.opt[0].count)
    tol = dict(rtol=2e-4, atol=1e-6)
    _assert_tree_close(lk.unflatten_actor(out[0], HIDDEN, action_dim=5),
                       p_ref, **tol)
    _assert_tree_close(lk.unflatten_actor(out[1], HIDDEN, action_dim=5),
                       opt2[0].mu, **tol)
    np.testing.assert_allclose(float(out[3]), float(loss_ref),
                               rtol=1e-5, atol=1e-7)


def test_lrpg_kernel_interpret_matches_math_twin():
    agent = _lrpg_agent()
    st = agent.init(0)
    obs_dim = agent.env.obs_shape[0]
    window = _lrpg_window(jax.random.PRNGKey(6), obs_dim)
    h = agent.cfg.hidden
    groups = (lk.flatten_actor(st.params, h),
              lk.flatten_actor(st.opt[0].mu, h),
              lk.flatten_actor(st.opt[0].nu, h))
    blk = 32
    run = lk.lrpg_update_phase(HIDDEN, obs_dim, N_ROWS, lr=agent.cfg.lr,
                               entropy_coef=agent.cfg.entropy_coef,
                               num_actions=5, block_size=blk,
                               interpret=True)
    new_groups, loss = jax.jit(run)(groups, window, st.opt[0].count)
    want = jax.jit(functools.partial(
        lk.lrpg_update_phase_math, hidden=HIDDEN, lr=agent.cfg.lr,
        entropy_coef=agent.cfg.entropy_coef, num_actions=5,
        num_blocks=N_ROWS // blk))(*groups, window, st.opt[0].count)
    tol = dict(rtol=1e-5, atol=1e-7)
    for got_g, want_g in zip(new_groups, want[:3]):
        _assert_tree_close(got_g, want_g, **tol)
    np.testing.assert_allclose(float(loss), float(want[3]), **tol)


def test_lrpg_train_step_kernel_learner_matches_xla_learner():
    """Full LRPG train_step parity: kernel-mode agent (flat state, fused
    softmax-PG update kernel) vs the XLA agent, same seed."""
    cfg = dict(hidden=(32, 32), rollout_steps=8, learner_block=64)
    env = CartPole3D(CartPoleParams(), num_envs=64)
    ag_x = LRPG(env, LRPGConfig(learner="xla", **cfg))
    ag_k = LRPG(env, LRPGConfig(learner="kernel", **cfg))
    assert not ag_x.kernel_mode and ag_k.kernel_mode
    st_x, st_k = ag_x.init(0), ag_k.init(0)
    assert isinstance(st_k.params, (list, tuple))
    ts_x = ag_x.make_train_step(fused=False)
    ts_k = ag_k.make_train_step(fused=False)
    for _ in range(4):
        st_x, m_x = ts_x(st_x)
        st_k, m_k = ts_k(st_k)
    tree_k = ag_k.state_to_tree(st_k)
    tol = dict(rtol=2e-4, atol=1e-5)
    _assert_tree_close(tree_k.params, st_x.params, **tol)
    assert int(st_k.opt[0].count) == int(st_x.opt[0].count)
    np.testing.assert_allclose(float(tree_k.baseline),
                               float(st_x.baseline), **tol)
    for key in ("loss", "return_mean", "reward_mean", "done_frac"):
        np.testing.assert_allclose(np.asarray(m_k[key]),
                                   np.asarray(m_x[key]), **tol)
    assert float(m_k["learner_impl"]) == 1.0
    assert float(m_x["learner_impl"]) == 0.0
    # Greedy eval works on the flat state; round-trip is the identity.
    stats = jax.jit(lambda s: ag_k.evaluate(s, num_steps=16))(st_k)
    assert np.isfinite(float(stats["reward_mean"]))
    rt = ag_k.state_to_tree(ag_k.state_from_tree(tree_k))
    _assert_tree_close(rt.params, tree_k.params, rtol=0, atol=0)


@pytest.mark.parametrize("agent_kind", ["ddpg", "naf"])
def test_kernel_lr_schedule_matches_optax(agent_kind):
    """lr_decay_env_steps keeps the fused kernel (round 3): the kernel
    computes the optax.linear_schedule twin from its Adam step count
    (_sched_lr), so a kernel-mode train run with lr decay matches the
    XLA optax run step for step — including PAST the transition horizon
    (the schedule clamps)."""
    from cartpoleplusplus_tpu.agents import NAF, NAFConfig

    base = dict(hidden=(32, 32), batch_size=64, rollout_steps=4,
                updates_per_step=2, warmup_env_steps=0, learner_block=32,
                replay_capacity_per_env=16,
                lr_decay_env_steps=16, lr_end_frac=0.25)
    if agent_kind == "ddpg":
        env = CartPole3D(continuous_params(), num_envs=64)
        mk = lambda learner: DDPG(env, DDPGConfig(learner=learner, **base))
        params_of = lambda st, ag: (ag.state_to_tree(st).actor
                                    if hasattr(ag, "state_to_tree")
                                    else st.actor)
    else:
        env = CartPole3D(continuous_params(), num_envs=64)
        mk = lambda learner: NAF(env, NAFConfig(learner=learner, **base))
        params_of = lambda st, ag: ag.state_to_tree(st).params
    ag_x, ag_k = mk("xla"), mk("kernel")
    assert not ag_x.kernel_mode and ag_k.kernel_mode
    st_x, st_k = ag_x.init(0), ag_k.init(0)
    ts_x = ag_x.make_train_step(fused=False)
    ts_k = ag_k.make_train_step(fused=False)
    # 6 steps x 2 updates = 12 gradient steps: crosses the 8-step
    # transition horizon (16 env-steps * 2 upd / 4 rollout).
    for _ in range(6):
        st_x, m_x = ts_x(st_x)
        st_k, m_k = ts_k(st_k)
    tol = dict(rtol=3e-4, atol=2e-5)
    _assert_tree_close(params_of(st_k, ag_k), params_of(st_x, ag_x),
                       **tol)
