from .quaternion import pole_quaternion, tilt_angle_from_quat

__all__ = ["pole_quaternion", "tilt_angle_from_quat"]
