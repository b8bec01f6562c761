from .params import CartPoleParams, continuous_params
from .dynamics import (
    PhysState,
    accel_components,
    apply_push_impulse,
    contact_normal_force,
    pole_w,
    rest_state,
    run_substeps,
    solve_accel,
    substep,
    substep_components,
    total_energy,
)

__all__ = [
    "CartPoleParams",
    "continuous_params",
    "PhysState",
    "accel_components",
    "apply_push_impulse",
    "contact_normal_force",
    "pole_w",
    "rest_state",
    "run_substeps",
    "solve_accel",
    "substep",
    "substep_components",
    "total_energy",
]
