"""Random-action baseline agent.

Reference counterpart: `random_action_agent.py` — uniform-random actions,
used as the env smoke test and throughput harness (SURVEY.md §2a/§4;
reference mount empty this session).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..env import CartPole3D
from .common import as_key


class RandomAgent:
    """Uniform-random policy; `evaluate` is the batched smoke-test rollout."""

    def __init__(self, env: CartPole3D):
        self.env = env

    def policy(self, obs, key):
        b = obs.shape[0]
        if self.env.params.discrete_actions:
            return jax.random.randint(key, (b,), 0, self.env.num_actions)
        return jax.random.uniform(key, (b, self.env.action_dim),
                                  minval=-1.0, maxval=1.0)

    def evaluate(self, key, num_steps: int = 200):
        """Run `num_steps` random steps over the full batch; returns
        per-step mean reward and episode statistics (all on device)."""
        k_env, k_pol = jax.random.split(as_key(key))
        state, _ = self.env.reset(k_env)
        state, (obs, action, reward, done) = self.env.rollout(
            state, self.policy, num_steps, policy_key=k_pol)
        episodes = jnp.sum(done)
        return {
            "reward_mean": jnp.mean(reward),
            "episodes": episodes,
            # Mean episode length approximation over the window.
            "steps_per_episode": (jnp.float32(num_steps * self.env.num_envs)
                                  / jnp.maximum(episodes, 1)),
        }
