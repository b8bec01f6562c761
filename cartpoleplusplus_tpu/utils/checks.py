"""Numerical guards — the framework's sanitizer layer.

Reference counterpart: none (the reference relied on eyeballing GUI
rollouts); SURVEY.md §5 maps race/sanitizer tooling to "jax.debug /
checkify NaN guards + deterministic seeding" for this framework.

`checked_step` wraps any env/agent step in jax.experimental.checkify so
NaN/Inf or out-of-chart states surface as hard errors with a named check
instead of silently corrupting a 4096-env batch. Zero cost when unused:
the production paths never import this module.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def check_state(env, state) -> None:
    """checkify assertions over an EnvState (call inside a checked fn)."""
    p = env.params
    ph = state.phys
    for name, arr in (("pos", ph.pos), ("vel", ph.vel), ("s", ph.s),
                      ("sd", ph.sd)):
        checkify.check(jnp.all(jnp.isfinite(arr)),
                       f"non-finite {name} in EnvState")
    checkify.check(jnp.all(jnp.sum(ph.s * ph.s, -1) <= p.s_norm_max ** 2
                           + 1e-6),
                   "pole direction left the |s| chart")
    checkify.check(jnp.all(jnp.abs(ph.vel) <= p.vel_max + 1e-3),
                   "velocity exceeded vel_max clamp")
    checkify.check(jnp.all(state.steps >= 0), "negative step counter")


def checked_step(env):
    """A jitted env.step twin that errors loudly on numerical corruption.

    Returns fn(state, action) -> (err, (state, obs, reward, done, info));
    call `err.throw()` on host to raise. Use in debugging sessions or CI
    soak tests, not the hot path.
    """

    def step(state, action):
        new_state, obs, reward, done, info = env.step(state, action)
        check_state(env, new_state)
        checkify.check(jnp.all(jnp.isfinite(obs)), "non-finite observation")
        checkify.check(jnp.all(jnp.isfinite(reward)), "non-finite reward")
        return new_state, obs, reward, done, info

    return jax.jit(checkify.checkify(step))


def assert_finite_tree(tree, name: str = "tree") -> None:
    """Host-side finite check over any pytree (post-fetch debugging)."""
    import numpy as np

    bad = [path for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
           if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating)
           and not bool(np.all(np.isfinite(np.asarray(leaf))))]
    if bad:
        raise FloatingPointError(
            f"non-finite leaves in {name}: {[str(p) for p in bad]}")
