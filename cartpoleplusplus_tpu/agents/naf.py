"""NAF (Normalized Advantage Function) continuous-control agent.

Reference counterpart: `naf_cartpole.py` — continuous Q-learning with a
quadratic advantage head A(s,a) = -1/2 (a-mu)^T P(s) (a-mu), target network
and replay (SURVEY.md §2a; reference mount empty this session).

TPU-native redesign: same fused actor-learner shape as ddpg.py; the
quadratic-advantage algebra lives in models/nets.py::NafNet. Exploration is
Gaussian noise on mu (the reference used OU/Gaussian variants).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..env import CartPole3D
from ..models import NafNet, polyak
from ..utils.prng import normal
from .common import (TAG_NAF_X, TAG_NAF_Y, as_key, gated_update_scan,
                     replay_presample, run_rollout)
from .replay import ReplayBuffer, ReplayState


@dataclasses.dataclass(frozen=True)
class NAFConfig:
    # Defaults are the round-2 TPU sweep winner (BASELINE.md learning
    # table): 40k per-env steps at 1024 envs reaches eval mean episode
    # length 128.6/145.1 (seeds 0/1) vs ~35 for the round-1 settings
    # (tau 0.005, 4 updates, constant sigma).
    hidden: tuple = (256, 256)
    lr: float = 5e-4
    gamma: float = 0.99
    tau: float = 0.01
    batch_size: int = 256
    rollout_steps: int = 8
    updates_per_step: int = 8
    replay_capacity_per_env: int = 1024
    noise_sigma: float = 0.2
    noise_sigma_min: float = 0.02    # floor after decay
    noise_sigma_decay_env_steps: int = 30000  # linear horizon (0 = constant)
    # NAF's advantage head is an unconstrained Cholesky factor L: its
    # entries (and so the Q curvature) can grow without bound, which
    # shows up as late-training divergence (done_frac spiking after an
    # initially healthy run). Global-norm gradient clipping bounds the
    # update magnitude through that head. 0 disables.
    max_grad_norm: float = 10.0
    warmup_env_steps: int = 16
    dtype: str = "float32"
    sample: str = "column"           # replay sampling: column (fast) | uniform


class NAFState(NamedTuple):
    params: dict
    target: dict
    opt: tuple
    replay: ReplayState
    env_state: tuple
    obs: jax.Array
    rng: jax.Array
    env_steps: jax.Array


class NAF:
    def __init__(self, env: CartPole3D, config: NAFConfig = NAFConfig(),
                 dist_axis: str | None = None, num_shards: int = 1):
        """dist_axis / num_shards: set when train_step runs inside
        shard_map (dist/shardmap.py) with a PER-SHARD env — gradients and
        metrics pmean over the axis; per-shard PRNG decorrelates via
        axis_index; each shard samples batch_size/num_shards locally."""
        if env.params.discrete_actions:
            raise ValueError("NAF needs the continuous env")
        self.env = env
        self.cfg = config
        self.dist_axis = dist_axis
        self.num_shards = num_shards
        dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
        self.net = NafNet(action_dim=env.action_dim, hidden=config.hidden,
                          dtype=dtype)
        self.replay = ReplayBuffer(
            num_envs=env.num_envs,
            capacity_per_env=config.replay_capacity_per_env,
            obs_dim=env.obs_size, action_dim=env.action_dim, discrete=False)
        self.tx = (optax.chain(optax.clip_by_global_norm(
                       config.max_grad_norm), optax.adam(config.lr))
                   if config.max_grad_norm > 0.0
                   else optax.adam(config.lr))

    def init(self, key) -> NAFState:
        k_net, k_env, k_run = jax.random.split(as_key(key), 3)
        obs0 = jnp.zeros((1,) + self.env.obs_shape, jnp.float32)
        act0 = jnp.zeros((1, self.env.action_dim), jnp.float32)
        params = self.net.init(k_net, obs0, act0)
        env_state, obs = self.env.reset(k_env)
        return NAFState(
            params=params, target=jax.tree.map(jnp.copy, params),
            opt=self.tx.init(params), replay=self.replay.init(),
            env_state=env_state, obs=obs, rng=k_run,
            env_steps=jnp.int32(0))

    def act(self, params, obs, env_seed=None, t=None, sigma=None):
        """mu(s), plus counter-PRNG Gaussian exploration when
        (env_seed, t) are given — sharding-independent."""
        _, mu = self.net.apply(params, obs)
        if env_seed is None:
            return mu
        s = self.cfg.noise_sigma if sigma is None else sigma
        eps = jnp.stack([normal(env_seed, t, TAG_NAF_X),
                         normal(env_seed, t, TAG_NAF_Y)],
                        axis=-1) * s
        return jnp.clip(mu + eps, -1.0, 1.0)

    def _sigma(self, env_steps):
        """Linearly decayed exploration scale (same schedule shape as
        DDPG._sigma) — evaluated once per train_step from env_steps, so
        it is a pure function of global progress, not sharding layout."""
        c = self.cfg
        if c.noise_sigma_decay_env_steps <= 0:
            return jnp.float32(c.noise_sigma)
        frac = jnp.clip(env_steps.astype(jnp.float32)
                        / c.noise_sigma_decay_env_steps, 0.0, 1.0)
        return c.noise_sigma + frac * (c.noise_sigma_min - c.noise_sigma)

    def greedy_policy(self, st: NAFState):
        """mu policy fn(obs) -> action (no exploration)."""
        return lambda o: self.act(st.params, o)

    def evaluate(self, st: NAFState, num_steps: int = 200, seed: int = 0):
        """mu-policy evaluation (no exploration): episode stats."""
        from .common import evaluate_policy

        return evaluate_policy(self.env, self.greedy_policy(st), seed,
                               num_steps)

    def _loss(self, params, target, batch):
        obs, action, reward, next_obs, done = batch
        c = self.cfg
        v_next, _ = self.net.apply(target, next_obs)
        y = reward + c.gamma * (1.0 - done.astype(jnp.float32)) * v_next
        q, _, _ = self.net.apply(params, obs, action)
        return jnp.mean(jnp.square(q - jax.lax.stop_gradient(y)))

    def train_step(self, st: NAFState, capture: bool = False,
                   fused: bool = False) -> tuple[NAFState, dict]:
        """fused=True runs the rollout through the Pallas mu-in-the-loop
        kernel (ops/policy_rollout.py::naf_policy_rollout) instead of the
        XLA env scan — numerically twinned (tests/test_policy_rollout.py)."""
        c = self.cfg
        rng = st.rng
        env_seed = st.env_state.env_seed
        sigma = self._sigma(st.env_steps)

        if fused:
            from ..ops.policy_rollout import naf_policy_rollout
            run = naf_policy_rollout(self.env, tuple(c.hidden),
                                     c.rollout_steps)
            env_state, obs, traj = run(st.env_state, st.obs, st.params,
                                       st.env_steps, sigma)
        else:
            env_state, obs, traj = run_rollout(
                self.env,
                lambda o, t: self.act(st.params, o, env_seed, t, sigma),
                st.env_state, st.obs,
                st.env_steps + jnp.arange(c.rollout_steps, dtype=jnp.int32))
        replay = self.replay.add_trajectory(st.replay, *traj)
        env_steps = st.env_steps + c.rollout_steps
        st = st._replace(replay=replay, env_state=env_state, obs=obs,
                         rng=rng, env_steps=env_steps)

        def upd_body(s, batch):
            loss, grad = jax.value_and_grad(self._loss)(
                s.params, s.target, batch)
            if self.dist_axis is not None:
                loss, grad = jax.lax.pmean((loss, grad), self.dist_axis)
            upd, opt = self.tx.update(grad, s.opt, s.params)
            params = optax.apply_updates(s.params, upd)
            s = s._replace(params=params, opt=opt,
                           target=polyak(s.target, params, c.tau))
            return s, loss

        st, loss = gated_update_scan(
            st, upd_body, c.updates_per_step,
            env_steps >= c.warmup_env_steps, jnp.float32(0.0),
            presample=replay_presample(self.replay, c.sample, c.batch_size,
                                       self.num_shards, self.dist_axis))

        metrics_extra = {"traj": traj} if capture else {}
        reward_mean = jnp.mean(traj[2])
        done_frac = jnp.mean(traj[3].astype(jnp.float32))
        if self.dist_axis is not None:
            reward_mean, done_frac = jax.lax.pmean(
                (reward_mean, done_frac), self.dist_axis)
        return st, {
            **metrics_extra,
            "loss": loss,
            "reward_mean": reward_mean,
            "done_frac": done_frac,
            "env_steps": env_steps,
        }

    def fusable(self) -> bool:
        """Whether the Pallas mu-in-the-loop rollout covers this
        env/config shape (ops/policy_rollout.py::naf_fusable)."""
        from ..ops.policy_rollout import naf_fusable
        return naf_fusable(self.env, tuple(self.cfg.hidden))

    def make_train_step(self, capture: bool = False, fused=None):
        """Jitted train_step with donated state. capture=True additionally
        returns the rollout chunk in metrics["traj"] (time-major
        (obs, action, reward, done)) for the event-log sink. fused=None
        auto-selects the Pallas rollout kernel on TPU when the shape is
        coverable (single-device or per-shard batches only)."""
        if fused is None:
            fused = (self.fusable()
                     and jax.default_backend() == "tpu"
                     and (self.dist_axis is not None
                          or len(jax.devices()) == 1))
        return jax.jit(functools.partial(self.train_step, capture=capture,
                                         fused=fused),
                       donate_argnums=(0,))
