from .cartpole import (
    CartPole3D,
    EnvState,
    derive_env_seeds,
    make_step_fn,
    push_randomness,
    reset_randomness,
    to_seed,
)
from .obs import FRAME_SIZE, OBS_MODES, obs_size, pole_com, pose_frame, state_obs

__all__ = [
    "CartPole3D",
    "EnvState",
    "make_step_fn",
    "push_randomness",
    "reset_randomness",
    "derive_env_seeds",
    "to_seed",
    "FRAME_SIZE",
    "OBS_MODES",
    "obs_size",
    "pole_com",
    "pose_frame",
    "state_obs",
]
