"""Shared actor-learner building blocks (DDPG / DQN / NAF / LRPG).

The fused train_step of every replay agent has the same skeleton —
rollout scan, replay insert, warmup-gated K-update scan — factored here so
the per-agent files contain only their algorithm (losses, action
selection, target updates).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Counter-PRNG stream tags for agent exploration noise (utils/prng.py;
# env-side tags live in env/compute.py). Exploration is a pure function of
# (per-env seed, global step) so trajectories are sharding-independent.
TAG_OU_X = 0x41
TAG_OU_Y = 0x42
TAG_EPS_GATE = 0x43
TAG_EPS_ACT = 0x44
TAG_NAF_X = 0x45
TAG_NAF_Y = 0x46


def local_batch(global_batch: int, num_shards: int) -> int:
    """Per-shard learner minibatch under shard_map (config batch sizes
    are GLOBAL)."""
    return max(global_batch // num_shards, 1)


def as_key(key):
    """Accept an int seed or a PRNG key."""
    return jax.random.PRNGKey(key) if isinstance(key, int) else key


def run_rollout(env, act_fn, env_state, obs, keys):
    """Scan `len(keys)` env-steps with `act_fn(obs, key) -> action`.

    Returns (env_state, obs, traj) with traj = time-major
    (obs, action, reward, done). The reference's per-step Python agent
    loop, as one scan.
    """

    def body(carry, key):
        st, o = carry
        action = act_fn(o, key)
        st, o_next, reward, done, _ = env.step(st, action)
        return (st, o_next), (o, action, reward, done)

    (env_state, obs), traj = jax.lax.scan(body, (env_state, obs), keys)
    return env_state, obs, traj


def gated_update_scan(st, upd_body, num_updates: int, ready,
                     zero_metrics):
    """Warmup-gated learner phase: split st.rng, scan `upd_body(state,
    key)` over `num_updates` keys and average its metrics — or skip
    entirely (returning `zero_metrics`) until `ready` (replay warmup).
    st must carry a `rng` field."""

    def do(s):
        rng, k = jax.random.split(s.rng)
        s, metrics = jax.lax.scan(
            upd_body, s._replace(rng=rng),
            jax.random.split(k, num_updates))
        return s, jax.tree.map(jnp.mean, metrics)

    return jax.lax.cond(ready, do, lambda s: (s, zero_metrics), st)


def evaluate_policy(env, policy_fn, key, num_steps: int):
    """Greedy-policy evaluation over the batched env: `num_steps` steps
    with masked auto-reset, reduced to episode statistics on device.
    policy_fn(obs) -> action (deterministic — no exploration)."""
    state, _ = env.reset(as_key(key))
    state, (obs, action, reward, done) = env.rollout(
        state, lambda o, k: policy_fn(o), num_steps)
    episodes = jnp.sum(done)
    steps_total = jnp.float32(num_steps * env.num_envs)
    return {
        "reward_mean": jnp.mean(reward),
        "episodes": episodes,
        "mean_episode_length": steps_total / jnp.maximum(episodes, 1),
        "done_frac": jnp.mean(done.astype(jnp.float32)),
    }
