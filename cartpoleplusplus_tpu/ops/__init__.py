"""Hot-path kernels. `best_rollout` picks the fastest available
implementation for the current backend: the Pallas fused-VMEM kernel on
TPU (ops/fused_rollout.py — the native equivalent of Bullet's C++
`stepSimulation` loop), the XLA scan over env.step elsewhere. The jnp
path is the always-on correctness twin (tests/test_ops.py asserts state
parity between the two)."""

import jax

from .fused_rollout import pallas_rollout, reference_rollout


def best_rollout(env, num_steps: int):
    """Returns (jitted rollout fn state->(state, checksum), impl name)."""
    if (jax.default_backend() == "tpu"
            and env.num_envs % 1024 == 0
            and env.obs_mode == "pose_stack"
            and env.auto_reset):  # the kernel hard-codes masked auto-reset
        try:
            return pallas_rollout(env, num_steps), "pallas_fused"
        except Exception:  # pragma: no cover - fall back on lowering issues
            pass
    return reference_rollout(env, num_steps), "xla_scan"


__all__ = ["best_rollout", "pallas_rollout", "reference_rollout"]
