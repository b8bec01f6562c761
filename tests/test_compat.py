"""Migration-parity tests: gym-style adapter + URDF asset loading
(reference users' entry points — SURVEY.md §1 L1 public interface,
§2a URDF-assets row)."""

import argparse

import numpy as np

from cartpoleplusplus_tpu import CartPoleParams
from cartpoleplusplus_tpu.env.gym_adapter import Box, Discrete, GymCartPole3D
from cartpoleplusplus_tpu.physics.urdf import (
    DEFAULT_ASSET_DIR,
    params_from_urdf,
)
from cartpoleplusplus_tpu.physics.params import continuous_params


def test_urdf_defaults_match_params():
    """The bundled URDFs encode the same scene as CartPoleParams()."""
    p = params_from_urdf()
    d = CartPoleParams()
    assert p.cart_mass == d.cart_mass
    assert p.pole_mass == d.pole_mass
    assert p.pole_length == d.pole_length
    assert p.cart_rest_z == d.cart_rest_z
    assert p.ground_friction == d.ground_friction


def test_urdf_edit_changes_dynamics(tmp_path):
    """Editing the XML (the reference's tuning workflow) flows through."""
    import shutil
    for f in ("cart.urdf", "pole.urdf", "ground.urdf"):
        shutil.copy(f"{DEFAULT_ASSET_DIR}/{f}", tmp_path / f)
    txt = (tmp_path / "pole.urdf").read_text().replace(
        'mass value="0.1"', 'mass value="0.3"')
    (tmp_path / "pole.urdf").write_text(txt)
    p = params_from_urdf(str(tmp_path))
    assert p.pole_mass == 0.3
    assert p.total_mass == 1.3


def test_gym_adapter_episode():
    env = GymCartPole3D(seed=3)
    assert isinstance(env.action_space, Discrete)
    assert env.action_space.n == 5
    assert isinstance(env.observation_space, Box)
    obs = env.reset()
    assert obs.shape == env.observation_space.shape
    total, steps, done = 0.0, 0, False
    while not done and steps < 300:
        obs, reward, done, info = env.step(env.action_space.sample())
        total += reward
        steps += 1
    assert done and 1 <= steps <= 200
    assert "steps" in info
    img = env.render()
    assert img.dtype == np.uint8 and img.shape[-1] == 3
    # Next episode gets a different random push: after one noop step the
    # trajectories diverge (the initial pose itself is identical — the
    # push enters through velocity, which pose stacks don't encode).
    env.reset()
    first_a, _, _, _ = env.step(0)
    env.reset()
    first_b, _, _, _ = env.step(0)
    assert not np.allclose(first_a, first_b)


def test_gym_adapter_continuous_and_opts():
    parser = argparse.ArgumentParser()
    GymCartPole3D.add_opts(parser)
    args = parser.parse_args(["--env.pole-length", "2.0",
                              "--no-env.discrete-actions"])
    env = GymCartPole3D.from_opts(args)
    assert isinstance(env.action_space, Box)
    assert env._env.params.pole_length == 2.0
    env.reset()
    obs, reward, done, info = env.step(np.array([0.5, -0.5]))
    assert np.isfinite(reward)
