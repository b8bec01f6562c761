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
from .pixels import CameraConfig, RenderConfig, render_all_cameras

__all__ = [
    "CameraConfig",
    "RenderConfig",
    "render_all_cameras",
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
