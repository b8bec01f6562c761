from .cartpole import CartPole3D, EnvState, make_step_fn, push_randomness, reset_randomness
from .obs import FRAME_SIZE, OBS_MODES, obs_size, pole_com, pose_frame, state_obs

__all__ = [
    "CartPole3D",
    "EnvState",
    "make_step_fn",
    "push_randomness",
    "reset_randomness",
    "FRAME_SIZE",
    "OBS_MODES",
    "obs_size",
    "pole_com",
    "pose_frame",
    "state_obs",
]
