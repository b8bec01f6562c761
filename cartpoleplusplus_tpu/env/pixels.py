"""Batched on-device rendering of the scene — pixel observations.

Reference counterpart: `pybullet.getCameraImage` (Bullet's TinyRenderer, a
C++ software rasterizer) used by `bullet_cartpole.py` for the
pixel-observation variant: small RGB frames from 1-2 fixed cameras, stacked
over the action-repeat window (SURVEY.md §2a; BASELINE config 4
"/root/repo/BASELINE.json:10"; reference mount empty this session).

TPU-native redesign: rasterizing triangle meshes is hostile to SIMD
batching (per-primitive loops, z-buffer scatter). The scene here is three
analytic primitives (ground plane, cart box, pole capsule), so a branch-
free per-pixel RAY CAST is both simpler and a perfect fit for the VPU: one
fused elementwise program over (envs x H x W) rays, no scatter, no
data-dependent control flow. Camera rays are compile-time constants
(cameras are fixed); per-env work is just two ray-primitive intersections
and a Lambert shade.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..physics import CartPoleParams, PhysState, pole_w

_BIG = 1e9


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """A fixed pinhole camera looking at `target` from `eye`."""

    eye: tuple = (0.0, -2.4, 1.3)
    target: tuple = (0.0, 0.0, 0.6)
    up: tuple = (0.0, 0.0, 1.0)
    fov_deg: float = 45.0


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Render settings for the pixel-observation variant.

    Two default cameras at 90 degrees (front and side) mirror the
    reference's use of a second camera to disambiguate the y axis.
    """

    width: int = 48
    height: int = 48
    cameras: tuple = (
        CameraConfig(eye=(0.0, -2.4, 1.3)),
        CameraConfig(eye=(-2.4, 0.0, 1.3)),
    )
    grayscale: bool = False
    # Visual sizes (match the physics footprint; purely cosmetic beyond it).
    cart_half_extents: tuple = (0.25, 0.25, 0.1)
    pole_radius: float = 0.06
    # Ray-cast compute dtype: "bfloat16" doubles VPU throughput (the
    # renderer is VPU-bound at ~200 flops/pixel); outputs stay f32 in
    # [0, 1] either way. bf16's ~3 significant digits are ample for a
    # 48x48 conv-net observation (and the frames are replayed as uint8).
    dtype: str = "float32"

    @property
    def channels_per_camera(self) -> int:
        return 1 if self.grayscale else 3


def _normalize(v):
    return v / jnp.linalg.norm(v)


def camera_rays(cam: CameraConfig, width: int, height: int):
    """(H, W, 3) unit ray directions + (3,) origin, world frame.

    Pure constants under jit (the camera is static configuration).
    """
    eye = jnp.asarray(cam.eye, jnp.float32)
    fwd = _normalize(jnp.asarray(cam.target, jnp.float32) - eye)
    right = _normalize(jnp.cross(fwd, jnp.asarray(cam.up, jnp.float32)))
    up = jnp.cross(right, fwd)
    tan = math.tan(math.radians(cam.fov_deg) / 2.0)
    # Pixel centers, y down (image convention), square pixels.
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    ys = 1.0 - (jnp.arange(height, dtype=jnp.float32) + 0.5) / height * 2.0
    px = xs[None, :, None] * (tan * right)
    py = ys[:, None, None] * (tan * height / width * up)
    d = _normalize_rows(fwd + px + py)
    return eye, d


def _normalize_rows(v):
    return v * jax.lax.rsqrt(jnp.sum(v * v, -1, keepdims=True))


def _ray_plane_z0(eye, d):
    """Distance to the z=0 ground plane (+inf if missed)."""
    t = -eye[2] / d[..., 2]
    return jnp.where((d[..., 2] < -1e-6) & (t > 0.0), t, _BIG)


def _ray_aabox(eye, d, center, half):
    """Slab-method ray vs axis-aligned box. center: (..., 3) per env
    broadcast against rays; returns (t, normal)."""
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
    lo = (center - half - eye) * inv
    hi = (center + half - eye) * inv
    tmin = jnp.minimum(lo, hi)
    tmax = jnp.maximum(lo, hi)
    t_near = jnp.max(tmin, axis=-1)
    t_far = jnp.min(tmax, axis=-1)
    hit = (t_near <= t_far) & (t_far > 0.0)
    t = jnp.where(hit, jnp.where(t_near > 0.0, t_near, t_far), _BIG)
    # Normal: the axis achieving t_near, signed against the ray.
    is_axis = (tmin == t_near[..., None]).astype(jnp.float32)
    normal = _normalize_rows(is_axis * -jnp.sign(d) + 1e-9)
    return t, normal


def _ray_capsule(eye, d, a, b, r):
    """Ray vs capsule from a to b with radius r (branch-free closed form).

    Infinite-cylinder quadratic clamped to the segment, plus the two
    sphere caps; the minimum positive root wins.
    """
    ba = b - a
    oa = eye - a
    baba = jnp.sum(ba * ba, -1)
    bard = jnp.sum(ba * d, -1)
    baoa = jnp.sum(ba * oa, -1)
    rdoa = jnp.sum(d * oa, -1)
    oaoa = jnp.sum(oa * oa, -1)
    a2 = baba - bard * bard
    b2 = baba * rdoa - baoa * bard
    c2 = baba * oaoa - baoa * baoa - r * r * baba
    h = b2 * b2 - a2 * c2
    sqrt_h = jnp.sqrt(jnp.maximum(h, 0.0))
    t_cyl = (-b2 - sqrt_h) / jnp.where(jnp.abs(a2) < 1e-9, 1e-9, a2)
    y = baoa + t_cyl * bard
    cyl_ok = (h > 0.0) & (y > 0.0) & (y < baba) & (t_cyl > 0.0)

    def sphere(center):
        oc = eye - center
        bq = jnp.sum(d * oc, -1)
        cq = jnp.sum(oc * oc, -1) - r * r
        hq = bq * bq - cq
        t = -bq - jnp.sqrt(jnp.maximum(hq, 0.0))
        return jnp.where((hq > 0.0) & (t > 0.0), t, _BIG)

    t = jnp.where(cyl_ok, t_cyl, _BIG)
    t = jnp.minimum(t, jnp.minimum(sphere(a), sphere(b)))

    # Normal at the hit point.
    pos = eye + t[..., None] * d
    h_along = jnp.clip(jnp.sum((pos - a) * ba, -1) / baba, 0.0, 1.0)
    axis_pt = a + h_along[..., None] * ba
    normal = _normalize_rows(pos - axis_pt)
    return t, normal


def render(p: CartPoleParams, phys: PhysState, cfg: RenderConfig,
           cam: CameraConfig) -> jax.Array:
    """One camera view of every env: (B, H, W, 3) float32 in [0, 1].

    Compositing is an incremental z-test (closest-so-far select per
    primitive) rather than stack+argmin: one long fusible elementwise
    chain with no (B, H, W, 3)-sized gather, which XLA fuses into a
    single VPU loop over rays."""
    dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    eye, rays = camera_rays(cam, cfg.width, cfg.height)  # (3,), (H, W, 3)
    eye = eye.astype(dt)
    d = rays.astype(dt)[None]           # (1, H, W, 3) broadcast over envs
    cart = phys.pos.astype(dt)[:, None, None, :]   # (B, 1, 1, 3)

    # Ground: checkerboard so cart translation is visible.
    bhw = (cart.shape[0],) + rays.shape[:2]
    t_gnd = jnp.broadcast_to(_ray_plane_z0(eye, d), bhw)
    gpos = eye + t_gnd[..., None] * d
    checker = (jnp.floor(gpos[..., 0]) + jnp.floor(gpos[..., 1])) % 2.0
    gnd_col = (0.35 + 0.25 * checker)[..., None] * jnp.ones(3, dt)

    # Cart: axis-aligned box (the cart does not yaw — env/obs.py).
    half = jnp.asarray(cfg.cart_half_extents, dt)
    t_cart, n_cart = _ray_aabox(eye, d, cart, half)
    cart_col = jnp.asarray([0.85, 0.25, 0.2], dt)

    # Pole: capsule from the pivot along the direction vector u.
    sx, sy = phys.s[..., 0], phys.s[..., 1]
    w = pole_w(p, sx, sy)
    u = jnp.stack([sx, sy, w], -1).astype(dt)[:, None, None, :]
    pivot = cart + jnp.asarray([0.0, 0.0, p.pivot_height], dt)
    tip = pivot + jnp.asarray(p.pole_length, dt) * u
    t_pole, n_pole = _ray_capsule(eye, d, pivot, tip,
                                  jnp.asarray(cfg.pole_radius, dt))
    pole_col = jnp.asarray([0.2, 0.45, 0.9], dt)

    # Depth-composite: closest-so-far select per primitive.
    t_hit = t_gnd
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], dt),
                              bhw + (3,))
    base = gnd_col
    for t_p, n_p, c_p in ((t_cart, n_cart, cart_col),
                          (t_pole, n_pole, pole_col)):
        closer = (t_p < t_hit)[..., None]
        normal = jnp.where(closer, n_p, normal)
        base = jnp.where(closer, c_p, base)
        t_hit = jnp.minimum(t_p, t_hit)

    light = _normalize(jnp.asarray([0.4, -0.3, 0.85], jnp.float32)).astype(
        dt)
    lambert = jnp.maximum(jnp.sum(normal * light, -1), 0.0)
    shade = (0.45 + 0.55 * lambert)[..., None]
    sky = jnp.asarray([0.7, 0.8, 0.95], dt)
    img = jnp.where((t_hit < _BIG * 0.5)[..., None], base * shade, sky)
    return jnp.clip(img, 0.0, 1.0).astype(jnp.float32)


def render_all_cameras(p: CartPoleParams, phys: PhysState,
                       cfg: RenderConfig) -> jax.Array:
    """(B, H, W, 3*num_cameras) — cameras stacked on channels."""
    views = [render(p, phys, cfg, cam) for cam in cfg.cameras]
    if cfg.grayscale:
        views = [jnp.mean(v, -1, keepdims=True) for v in views]
    return jnp.concatenate(views, axis=-1)


def pixel_obs_shape(p: CartPoleParams, cfg: RenderConfig) -> tuple:
    """(H, W, C): repeats and cameras stack on channels (the reference
    stacks repeat-window frames in lieu of velocities)."""
    c = cfg.channels_per_camera * len(cfg.cameras) * p.action_repeats
    return (cfg.height, cfg.width, c)
