"""Checkpoint / resume.

Reference counterpart: the per-trainer TensorFlow `Saver` checkpoints
(`--ckpt-dir`, periodic save/restore) in rebcabin/cartpoleplusplus
(SURVEY.md §5 checkpoint row; reference mount empty this session).

TPU-native redesign: orbax-checkpoint over the WHOLE agent TrainState
pytree — networks, optimizer moments, target nets, device-resident replay
buffer, env state and PRNG keys — so a resumed run continues bit-exact,
not just "with the same weights". Multi-host safe: orbax coordinates a
single logical checkpoint across processes and restores with the sharding
of a provided abstract target.
"""

from .checkpoint import CheckpointManager, restore_checkpoint, save_checkpoint

__all__ = ["CheckpointManager", "save_checkpoint", "restore_checkpoint"]
