"""DQN on the discrete 5-action env.

Reference counterpart: `dqn_cartpole.py` — a keras-rl `DQNAgent` fit on the
discrete env (SURVEY.md §2a/§3.4; BASELINE discrete configs
/root/repo/BASELINE.json:7-8; reference mount empty this session).

TPU-native redesign: same fused actor-learner shape as ddpg.py — one jitted
`train_step` = epsilon-greedy rollout scan + replay insert + K TD(0)
updates with a Polyak (soft) target network. keras-rl's Python callback
loop is replaced by `lax.scan`.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..env import CartPole3D
from ..models import QNetMLP, VisualQNet, polyak
from ..utils.prng import hash_words, uniform
from .common import (TAG_EPS_ACT, TAG_EPS_GATE, _notice_learner_fallback,
                     as_key, gated_update_scan, gather_batches, local_batch,
                     make_train_scan, replay_presample, replay_sampler,
                     resolve_fused, run_rollout)
from .replay import ReplayBuffer, ReplayState


@dataclasses.dataclass(frozen=True)
class DQNConfig:
    # Defaults are the round-2 TPU sweep winner (BASELINE.md learning
    # table): 40k per-env steps at 1024 envs reaches eval mean episode
    # length 199.98/200 — the greedy policy balances to the cap. The
    # lever was the learning rate: 5e-4 plateaued at ~25, 2e-4 at ~39,
    # 1e-4 at ~159, 5e-5 solves (the TD target through the soft target
    # net tolerates far less optimizer noise than the sweep's start).
    hidden: tuple = (256, 256)
    lr: float = 5e-5
    gamma: float = 0.99
    tau: float = 0.01
    batch_size: int = 256
    rollout_steps: int = 8
    updates_per_step: int = 8
    replay_capacity_per_env: int = 1024
    eps_start: float = 1.0
    eps_end: float = 0.02
    eps_decay_env_steps: int = 10000  # linear decay horizon (per-env steps)
    warmup_env_steps: int = 16
    double_dqn: bool = True
    dtype: str = "float32"
    sample: str = "column"           # replay sampling: column (fast) | uniform
    # Learner implementation: "xla" (the upd_body scan), "kernel" (the
    # whole K-update phase as ONE Pallas kernel with the Q/target/Adam
    # state VMEM-resident — ops/learner_kernel.py), or "auto" (kernel on
    # a single TPU device when the config shape is covered). Kernel-mode
    # states keep the 4 learner groups in the kernel's flat operand
    # layout; checkpoints are converted to canonical trees (train.py).
    learner: str = "auto"
    learner_block: int = 512         # kernel batch-block (VMEM budget)
    learner_precision: str | None = None  # in-kernel matmul precision
    # Pixel-obs encoder: "conv" | "patch" (see DDPGConfig.encoder).
    encoder: str = "conv"
    # Conv-encoder channel widths (pixel obs only; see DDPGConfig).
    conv_features: tuple = (16, 32, 32)


class DQNState(NamedTuple):
    q: dict
    q_target: dict
    opt: tuple
    replay: ReplayState
    env_state: tuple
    obs: jax.Array
    rng: jax.Array
    env_steps: jax.Array


class DQN:
    def __init__(self, env: CartPole3D, config: DQNConfig = DQNConfig(),
                 dist_axis: str | None = None, num_shards: int = 1):
        """dist_axis / num_shards: set when train_step runs inside
        shard_map (dist/shardmap.py) with a PER-SHARD env — gradients and
        metrics pmean over the axis; per-shard PRNG decorrelates via
        axis_index; each shard samples batch_size/num_shards locally."""
        if not env.params.discrete_actions:
            raise ValueError("DQN needs the discrete env")
        self.env = env
        self.cfg = config
        self.dist_axis = dist_axis
        self.num_shards = num_shards
        dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
        pixels = env.obs_mode == "pixels"
        if pixels:
            self.q_net = VisualQNet(num_actions=env.num_actions,
                                    hidden=config.hidden, dtype=dtype,
                                    encoder=config.encoder,
                                    features=tuple(config.conv_features))
        else:
            self.q_net = QNetMLP(num_actions=env.num_actions,
                                 hidden=config.hidden, dtype=dtype)
        self.replay = ReplayBuffer(
            num_envs=env.num_envs,
            capacity_per_env=config.replay_capacity_per_env,
            obs_shape=env.obs_shape, quantize_obs=pixels, discrete=True)
        if config.sample == "block":
            lb = local_batch(config.batch_size, max(self.num_shards, 1))
            if lb > env.num_envs or env.num_envs % lb:
                raise ValueError(
                    f"sample='block' needs the per-shard batch ({lb}) to "
                    f"divide num_envs ({env.num_envs}) — lower "
                    f"--<agent>.batch-size or use sample='column'")
        self.tx = optax.adam(config.lr)
        if config.learner == "kernel":
            if not self.kernel_learner_ok():
                raise ValueError("config shape not coverable by the "
                                 "fused update kernel (see "
                                 "DQN.kernel_learner_ok)")
            self.kernel_mode = True
        elif config.learner == "auto":
            # Same placement rule as resolve_fused: single device, or
            # per-shard bodies under shard_map (dist_axis).
            self.kernel_mode = (self.kernel_learner_ok()
                                and jax.default_backend() == "tpu"
                                and (len(jax.devices()) == 1
                                     or self.dist_axis is not None))
        elif config.learner == "xla":
            self.kernel_mode = False
        else:
            raise ValueError(f"unknown learner {config.learner!r}")
        _notice_learner_fallback("dqn", config.learner, self.kernel_mode)

    def kernel_learner_ok(self) -> bool:
        """Whether ops/learner_kernel.py covers this config (state obs,
        default semantics, f32, presample-able replay). Under shard_map
        the kernel composes via batch replication — the K per-shard
        minibatches are all_gathered and every shard runs the identical
        full-batch kernel (agents/common.py::gather_batches), so the
        global batch must split evenly over shards."""
        c = self.cfg
        return (self.env.obs_mode != "pixels"
                and not self.replay.quantize_obs
                and len(c.hidden) >= 1
                and c.updates_per_step >= 1   # a K=0 phase has no grid
                and c.dtype == "float32"
                and c.batch_size % max(self.num_shards, 1) == 0
                and local_batch(c.batch_size, self.num_shards) % 8 == 0)

    def init(self, key) -> DQNState:
        k_q, k_env, k_run = jax.random.split(as_key(key), 3)
        obs0 = jnp.zeros((1,) + self.env.obs_shape, jnp.float32)
        q = self.q_net.init(k_q, obs0)
        env_state, obs = self.env.reset(k_env)
        st = DQNState(
            q=q, q_target=jax.tree.map(jnp.copy, q), opt=self.tx.init(q),
            replay=self.replay.init(), env_state=env_state, obs=obs,
            rng=k_run, env_steps=jnp.int32(0))
        return self.state_from_tree(st) if self.kernel_mode else st

    # --- kernel-mode state layout (see agents/ddpg.py for rationale) ----
    def state_to_tree(self, st: DQNState) -> DQNState:
        """Kernel-layout state -> canonical flax-tree state (no-op for
        tree-mode states). The canonical layout is what checkpoints
        hold (train.py converts at the save/restore boundary)."""
        if not isinstance(st.q, (list, tuple)):
            return st
        from ..ops import learner_kernel as lk

        h = tuple(self.cfg.hidden)
        na = self.env.num_actions
        return st._replace(
            q=lk.unflatten_actor(st.q, h, action_dim=na),
            q_target=lk.unflatten_actor(st.q_target, h, action_dim=na),
            opt=(st.opt[0]._replace(
                mu=lk.unflatten_actor(st.opt[0].mu, h, action_dim=na),
                nu=lk.unflatten_actor(st.opt[0].nu, h, action_dim=na)),
            ) + tuple(st.opt[1:]))

    def state_from_tree(self, st: DQNState) -> DQNState:
        """Canonical tree state -> this agent's native layout."""
        if not self.kernel_mode or isinstance(st.q, (list, tuple)):
            return st
        from ..ops import learner_kernel as lk

        h = tuple(self.cfg.hidden)
        return st._replace(
            q=lk.flatten_actor(st.q, h),
            q_target=lk.flatten_actor(st.q_target, h),
            opt=(st.opt[0]._replace(
                mu=lk.flatten_actor(st.opt[0].mu, h),
                nu=lk.flatten_actor(st.opt[0].nu, h)),
            ) + tuple(st.opt[1:]))

    def _q_tree(self, q_params):
        """Q params as the flax tree (unflattens kernel layout)."""
        if isinstance(q_params, (list, tuple)):
            from ..ops import learner_kernel as lk
            return lk.unflatten_actor(q_params, tuple(self.cfg.hidden),
                                      action_dim=self.env.num_actions)
        return q_params

    def epsilon(self, env_steps):
        c = self.cfg
        if c.eps_decay_env_steps <= 0:  # no decay horizon: constant floor
            return jnp.float32(c.eps_end)
        frac = jnp.clip(env_steps.astype(jnp.float32)
                        / c.eps_decay_env_steps, 0.0, 1.0)
        return c.eps_start + frac * (c.eps_end - c.eps_start)

    def act(self, q_params, obs, env_seed, t, eps):
        """Epsilon-greedy batched action; exploration is a counter-PRNG
        function of (per-env seed, global step) — sharding-independent."""
        qv = self.q_net.apply(self._q_tree(q_params), obs)
        greedy = jnp.argmax(qv, axis=-1).astype(jnp.int32)
        rand = (hash_words(env_seed, t, TAG_EPS_ACT)
                % jnp.uint32(self.env.num_actions)).astype(jnp.int32)
        explore = uniform(0.0, 1.0, env_seed, t, TAG_EPS_GATE) < eps
        return jnp.where(explore, rand, greedy)

    def greedy_policy(self, st: DQNState):
        """Greedy policy fn(obs) -> action (epsilon = 0)."""
        q_tree = self._q_tree(st.q)
        return lambda o: jnp.argmax(self.q_net.apply(q_tree, o),
                                    -1).astype(jnp.int32)

    def evaluate(self, st: DQNState, num_steps: int = 200, seed: int = 0):
        """Greedy-policy evaluation (epsilon = 0): episode stats."""
        from .common import evaluate_policy

        return evaluate_policy(self.env, self.greedy_policy(st), seed,
                               num_steps)

    def _loss(self, q, q_target, batch):
        obs, action, reward, next_obs, done = batch
        c = self.cfg
        qn_t = self.q_net.apply(q_target, next_obs)
        if c.double_dqn:
            a_star = jnp.argmax(self.q_net.apply(q, next_obs), axis=-1)
            q_next = jnp.take_along_axis(qn_t, a_star[:, None], 1)[:, 0]
        else:
            q_next = jnp.max(qn_t, axis=-1)
        y = reward + c.gamma * (1.0 - done.astype(jnp.float32)) * q_next
        qv = self.q_net.apply(q, obs)
        q_sa = jnp.take_along_axis(qv, action[:, None], 1)[:, 0]
        return jnp.mean(optax.huber_loss(q_sa, jax.lax.stop_gradient(y)))

    def train_step(self, st: DQNState, capture: bool = False,
                   fused: bool = False) -> tuple[DQNState, dict]:
        """fused=True runs the rollout through the Pallas Q-in-the-loop
        kernel (ops/policy_rollout.py::q_policy_rollout) instead of the
        XLA env scan — numerically twinned (tests/test_policy_rollout.py),
        same speedup family as the DDPG fused path (BASELINE.md)."""
        c = self.cfg
        rng = st.rng
        eps = self.epsilon(st.env_steps)
        env_seed = st.env_state.env_seed

        if fused:
            from ..ops.policy_rollout import q_policy_rollout
            run = q_policy_rollout(self.env, tuple(c.hidden),
                                   c.rollout_steps)
            env_state, obs, traj = run(st.env_state, st.obs, st.q,
                                       st.env_steps, eps)
        else:
            q_tree = self._q_tree(st.q)
            env_state, obs, traj = run_rollout(
                self.env,
                lambda o, t: self.act(q_tree, o, env_seed, t, eps),
                st.env_state, st.obs,
                st.env_steps + jnp.arange(c.rollout_steps, dtype=jnp.int32))
        # Pixel (quantized) rings insert AFTER the update phase so the
        # DUS is the ring's last use and XLA updates the multi-GB uint8
        # buffer in place (see agents/ddpg.py for the rationale and the
        # round-4 trace numbers). State-obs rings keep insert-first:
        # their batch streams stay bitwise unchanged.
        late_insert = self.replay.quantize_obs

        def insert(s):
            return s._replace(replay=self.replay.add_trajectory(
                s.replay, *traj, aligned=True))

        if not late_insert:
            st = insert(st)
        env_steps = st.env_steps + c.rollout_steps
        st = st._replace(env_state=env_state, obs=obs,
                         rng=rng, env_steps=env_steps)
        sampler = replay_sampler(self.replay, c.sample, c.batch_size,
                                 self.num_shards, self.dist_axis)

        def upd_body(s, batch):
            if not isinstance(batch, tuple):   # presample off: batch is
                batch = sampler(s.replay, batch)  # a PRNG key (pixels)
            loss, grad = jax.value_and_grad(self._loss)(
                s.q, s.q_target, batch)
            if self.dist_axis is not None:
                loss, grad = jax.lax.pmean((loss, grad), self.dist_axis)
            upd, opt = self.tx.update(grad, s.opt, s.q)
            q = optax.apply_updates(s.q, upd)
            s = s._replace(q=q, opt=opt,
                           q_target=polyak(s.q_target, q, c.tau))
            return s, loss

        ready = (True if c.warmup_env_steps <= 0
                 else env_steps >= c.warmup_env_steps)
        if self.kernel_mode:
            st, loss = self._kernel_update_phase(st, ready)
        else:
            st, loss = gated_update_scan(
                st, upd_body, c.updates_per_step, ready, jnp.float32(0.0),
                presample=replay_presample(self.replay, c.sample,
                                           c.batch_size, self.num_shards,
                                           self.dist_axis))
        if late_insert:
            st = insert(st)

        metrics_extra = {"traj": traj} if capture else {}
        reward_mean = jnp.mean(traj[2])
        done_frac = jnp.mean(traj[3].astype(jnp.float32))
        if self.dist_axis is not None:
            reward_mean, done_frac = jax.lax.pmean(
                (reward_mean, done_frac), self.dist_axis)
        return st, {
            **metrics_extra,
            "loss": loss,
            "epsilon": eps,
            "reward_mean": reward_mean,
            "done_frac": done_frac,
            "env_steps": env_steps,
            # 1.0 = fused Pallas update kernel, 0.0 = XLA update scan.
            "learner_impl": jnp.float32(1.0 if self.kernel_mode else 0.0),
        }

    def _kernel_update_phase(self, st: DQNState, ready):
        """The warmup-gated K-update learner phase through the fused
        Pallas kernel — the op-stream-free twin of gated_update_scan +
        upd_body (same rng splits -> bitwise-identical presampled
        batches; ops/learner_kernel.py)."""
        from ..ops import learner_kernel as lk

        c = self.cfg
        # Rows per update: the GLOBAL batch (per-shard minibatches are
        # all_gathered under shard_map — see gather_batches).
        kb = local_batch(c.batch_size, self.num_shards) \
            * max(self.num_shards, 1)
        blk = min(c.learner_block, kb)
        while kb % blk:
            blk //= 2
        run = lk.dqn_update_phase(
            tuple(c.hidden), self.env.obs_shape[0], c.updates_per_step,
            kb, lr=c.lr, gamma=c.gamma, tau=c.tau,
            num_actions=self.env.num_actions, double_dqn=c.double_dqn,
            block_size=blk, interpret=jax.default_backend() != "tpu",
            mm_precision=c.learner_precision)
        presample = replay_presample(self.replay, c.sample, c.batch_size,
                                     self.num_shards, self.dist_axis)
        gather = gather_batches(self.dist_axis)

        def do(s):
            rng, k = jax.random.split(s.rng)
            s = s._replace(rng=rng)
            keys = jax.random.split(k, c.updates_per_step)
            batches = gather(presample(s, keys))
            groups = (s.q, s.q_target, s.opt[0].mu, s.opt[0].nu)
            t0 = s.opt[0].count
            new, loss = run(groups, batches, t0)
            opt = (s.opt[0]._replace(
                count=t0 + jnp.int32(c.updates_per_step),
                mu=new[2], nu=new[3]),) + tuple(s.opt[1:])
            s = s._replace(q=new[0], q_target=new[1], opt=opt)
            return s, jnp.mean(loss)

        if ready is True:   # static: warmup disabled, no cond branch
            return do(st)
        return jax.lax.cond(ready, do, lambda s: (s, jnp.float32(0.0)),
                            st)

    def fusable(self) -> bool:
        """Whether the Pallas Q-in-the-loop rollout covers this
        env/config shape (ops/policy_rollout.py::q_fusable)."""
        from ..ops.policy_rollout import q_fusable
        return (self.env.obs_mode != "pixels"
                and q_fusable(self.env, tuple(self.cfg.hidden)))

    def make_train_step(self, capture: bool = False, fused=None):
        """Jitted train_step with donated state. capture=True additionally
        returns the rollout chunk in metrics["traj"] (time-major
        (obs, action, reward, done)) for the event-log sink. fused=None
        auto-selects the Pallas Q-rollout kernel on TPU when the shape is
        coverable (single-device or per-shard batches only — under the
        SPMD partitioner a pallas_call cannot be re-sharded)."""
        return jax.jit(functools.partial(self.train_step, capture=capture,
                                         fused=resolve_fused(self, fused)),
                       donate_argnums=(0,))

    def make_train_scan(self, num_calls: int, capture: bool = False,
                        fused=None):
        """`num_calls` train steps as ONE jitted dispatch (stacked
        metrics) — amortizes the per-call dispatch constant; see
        agents/common.py::make_train_scan."""
        return make_train_scan(self, num_calls, capture=capture,
                               fused=fused)
