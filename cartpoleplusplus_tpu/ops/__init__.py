"""Hot-path kernels. `best_rollout` picks the fastest available
implementation for the current backend (Pallas fused kernel on TPU, XLA
scan elsewhere); the jnp path is the always-on correctness twin."""

from ..bench.harness import build_rollout


def best_rollout(env, num_steps: int):
    """Returns (jitted rollout fn state->(state, checksum), impl name)."""
    return build_rollout(env, num_steps), "xla_scan"


__all__ = ["best_rollout"]
