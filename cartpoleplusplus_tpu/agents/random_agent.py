"""Random-action baseline agent.

Reference counterpart: `random_action_agent.py` — uniform-random actions,
used as the env smoke test and throughput harness (SURVEY.md §2a/§4;
reference mount empty this session).
"""

from __future__ import annotations

import jax

from ..env import CartPole3D


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
        per-step mean reward and exact per-episode statistics (all on
        device; agents/common.py::evaluate_policy)."""
        from .common import evaluate_policy

        stats = evaluate_policy(self.env, self.policy, key, num_steps,
                                needs_key=True)
        # Back-compat alias for the historical key name.
        stats["steps_per_episode"] = stats["mean_episode_length"]
        return stats
