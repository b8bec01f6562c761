"""Orbax-backed checkpointing of full agent training states.

The unit of persistence is the agent's TrainState NamedTuple (ddpg.py
etc.) — a pure pytree of arrays, so no custom serialization is needed.
`CheckpointManager` adds periodic-save/retention/resume bookkeeping, the
step-level API the reference exposed via TF Saver + `--ckpt-dir`.
"""

from __future__ import annotations

import os
import sys

import jax
import orbax.checkpoint as ocp


def _to_pytree(state, exclude=()):
    """NamedTuple -> plain nested dict (orbax-friendly, field-named).

    exclude: top-level field names to drop — e.g. ("replay",) for
    weights-only checkpoints when the replay buffer dwarfs the network
    (pixel replays easily exceed 1 GB; the reference's TF Saver likewise
    persisted only variables). Excluded fields restore to the values of
    the provided target (i.e. a fresh buffer), trading bit-exact resume
    for small, fast saves.
    """
    if hasattr(state, "_asdict"):
        return {k: _to_pytree(v) for k, v in state._asdict().items()
                if k not in exclude}
    return state


def _abstract_like(tree):
    """Restore template: ShapeDtypeStructs carrying the TARGET's
    shardings. to_shape_dtype_struct alone drops them, which makes
    orbax fall back to the SAVE-time shardings — unresolvable when the
    checkpoint was written on a different backend (a TPU-saved ckpt
    restored in a CPU process dies in deserialization with "sharding
    ... Got None"). Passing the target's sharding per leaf is what the
    module docstring always promised: arrays land where the target
    lives, making restores backend- and layout-portable."""
    def leaf(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                        sharding=x.sharding)
        # Non-device leaves (numpy arrays / Python scalars in the target)
        # carry no sharding, so construct_restore_args returns plain
        # RestoreArgs for them and they restore HOST-side (numpy), not as
        # sharded jax.Arrays. All current TrainState leaves are device
        # arrays; this branch exists for host-side targets (tests, tools)
        # and keeps their restore semantics host-side by design.
        return ocp.utils.to_shape_dtype_struct(x)
    return jax.tree.map(leaf, tree)


def _on_disk_fields(item_dir: str):
    """Top-level field names actually present in a saved checkpoint.

    Returns None when metadata is unreadable (then no template pruning
    happens and restore behaves strictly, as before). Used to reconcile
    the restore template with what the save-time `exclude` left on disk,
    so `--eval-only` on a weights-only (`--no-ckpt-full`) checkpoint
    works without the caller re-passing the save-time exclusion.
    """
    try:
        with ocp.StandardCheckpointer() as ckptr:
            meta = ckptr.metadata(item_dir).item_metadata
        return set(meta.keys())
    except Exception:
        return None


def _reconcile(abstract: dict, fields):
    """Prune `abstract` (the top-level restore request) to the fields on
    disk. Returns (request, needs_partial): needs_partial is True when
    the checkpoint holds fields the request does not ask for (e.g. a
    full save restored weights-only), which orbax only allows via a
    partial restore."""
    if fields is None:
        return abstract, False
    dropped = sorted(k for k in abstract if k not in fields)
    if dropped:
        print(f"ckpt: {', '.join(dropped)} not in checkpoint (weights-only "
              "save?); keeping fresh values", file=sys.stderr)
    request = {k: v for k, v in abstract.items() if k in fields}
    return request, bool(fields - set(request))


def _merge_restored(template, tree):
    """Like _from_pytree but tolerates fields missing from `tree`
    (excluded at save time): those keep the template's value."""
    if hasattr(template, "_asdict"):
        return type(template)(**{
            k: (_merge_restored(v, tree[k]) if k in tree else v)
            for k, v in template._asdict().items()})
    return tree


def _from_pytree(template, tree):
    """Rebuild the NamedTuple structure of `template` from a plain dict."""
    if hasattr(template, "_asdict"):
        return type(template)(**{
            k: _from_pytree(v, tree[k])
            for k, v in template._asdict().items()})
    return tree


def save_checkpoint(path: str, state, force: bool = True,
                    exclude: tuple = ()) -> None:
    """Write one checkpoint to `path` (a directory)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _to_pytree(state, exclude), force=force)


def restore_checkpoint(path: str, target, exclude: tuple = ()):
    """Restore into the structure (and shardings) of `target` — pass the
    freshly-initialized agent state; arrays land with target's sharding,
    which makes this multi-host / re-layout safe. Fields absent from the
    on-disk checkpoint (a weights-only save) keep target's values;
    `exclude` drops further fields from the request regardless."""
    path = os.path.abspath(path)
    abstract = _abstract_like(_to_pytree(target, exclude))
    request, needs_partial = _reconcile(abstract, _on_disk_fields(path))
    if needs_partial:
        with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
            restored = ckptr.restore(
                path, args=ocp.args.PyTreeRestore(
                    item=request,
                    restore_args=ocp.checkpoint_utils.
                    construct_restore_args(request),
                    partial_restore=True))
    else:
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(path, request)
    return _merge_restored(target, restored)


class CheckpointManager:
    """Periodic save / latest-resume over a checkpoint directory.

    Reference counterpart: the TF Saver save-every-N-steps loop. Orbax's
    CheckpointManager handles retention, atomicity (tmp dir + rename) and
    multi-host coordination.
    """

    def __init__(self, directory: str, save_interval_steps: int = 1,
                 max_to_keep: int = 3, exclude: tuple = ()):
        self._exclude = tuple(exclude)
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                save_interval_steps=save_interval_steps,
                max_to_keep=max_to_keep,
                create=True,
            ),
        )

    def save(self, step: int, state, force: bool = False) -> bool:
        """Save if the interval policy says so; returns whether saved.

        force=True bypasses orbax's own step-modulo re-check — REQUIRED
        when the caller's save cadence is windowed (train.py's chunked
        dispatch lands on step indices like 511, 1007 that satisfy the
        caller's interval window but not `step % interval == 0`; orbax
        silently skips those, which left long chunked-dispatch runs
        with a single early checkpoint — round-3 hardware bug)."""
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(
                _to_pytree(state, self._exclude)), force=force)
        return bool(saved)

    def should_save(self, step: int) -> bool:
        """Whether the interval policy would save at `step` — lets the
        caller skip state-layout conversion work on non-saving calls."""
        return bool(self._mgr.should_save(step))

    def latest_step(self):
        return self._mgr.latest_step()

    def restore(self, target, step: int | None = None):
        """Restore `step` (default: latest) into `target`'s structure.

        Adapts to the checkpoint's save-time exclusion: fields missing
        on disk keep `target`'s values (so `--eval-only` works on a
        weights-only save without re-passing `--no-ckpt-full`), and a
        full save restored with an exclusion uses a partial restore."""
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError("no checkpoint to restore")
        abstract = _abstract_like(_to_pytree(target, self._exclude))
        # Single-item CheckpointManager saves live under <dir>/<step>/default.
        item_dir = os.path.join(str(self._mgr.directory), str(step),
                                "default")
        if not os.path.isdir(item_dir):
            item_dir = os.path.join(str(self._mgr.directory), str(step))
        request, needs_partial = _reconcile(abstract,
                                            _on_disk_fields(item_dir))
        if needs_partial:
            restored = self._mgr.restore(
                step, args=ocp.args.PyTreeRestore(
                    item=request,
                    restore_args=ocp.checkpoint_utils.
                    construct_restore_args(request),
                    partial_restore=True))
        else:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(request))
        return _merge_restored(target, restored)

    def wait_until_finished(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
