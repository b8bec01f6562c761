"""Golden-trajectory regression: the jitted env vs frozen .npz files.

The files in tests/golden/ were generated once by tests/make_golden.py
and are committed — they, not any recomputed oracle, are the dynamics
contract (CLAUDE.md invariant; VERDICT round 1 missing #3). A change
anywhere in physics/dynamics.py, env/compute.py, utils/prng.py or the
observation/termination/reward/reset pipeline shows up here as a diff
against bits on disk, even if tests/oracle.py is edited in the same
commit. Tolerances are tight enough to catch any semantic change (a sign
flip diverges within a step) while allowing XLA version-to-version
fusion jitter.
"""

import os

import numpy as np
import pytest

from make_golden import GOLDEN_DIR, configs, roll_env


@pytest.mark.parametrize("name", sorted(configs()))
def test_golden_trajectories(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    assert os.path.exists(path), (
        f"missing {path} — run `python tests/make_golden.py` once and "
        "commit the output")
    ref = np.load(path)
    params = configs()[name]
    states, obs, rewards, dones = roll_env(
        params, num_envs=int(ref["num_envs"]),
        num_steps=int(ref["num_steps"]), seed=int(ref["seed"]))
    np.testing.assert_array_equal(dones, ref["dones"])
    np.testing.assert_allclose(states, ref["states"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(obs, ref["obs"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(rewards, ref["rewards"], rtol=1e-5,
                               atol=1e-6)


def test_golden_files_have_episode_ends():
    """The frozen windows must actually exercise termination + auto-reset
    (a trajectory with no done would leave the reset path unfrozen)."""
    for name in configs():
        ref = np.load(os.path.join(GOLDEN_DIR, f"{name}.npz"))
        assert ref["dones"].sum() > 0, name
