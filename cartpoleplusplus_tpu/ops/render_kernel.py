"""Pallas TPU kernel: the per-pixel raycast renderer in one VMEM pass.

Round-1/2 measurement: the XLA renderer is HBM-traffic-bound — every
(B, H, W, 3)-shaped intermediate of the ray cast spills ~28 MB per
camera at 1024 envs, and the pixel env tops out at 240-350k env-steps/s
while the VPU sits mostly idle. This kernel evaluates the ENTIRE
raycast + shade pipeline (env/pixels.py::shade_components — the single
math source, unchanged) on (env-block, n_pixels) VMEM tiles: env
components broadcast down sublanes, per-pixel ray constants along
lanes, zero intermediate HBM traffic. ALL cameras render in one call —
their ray-constant rows (directions, reciprocals, and per-camera eye
positions) are concatenated along the pixel axis, so per-dispatch and
per-grid-iteration overheads are paid once per frame, not per camera.

Reference counterpart: pybullet.getCameraImage's TinyRenderer — the
C++ software rasterizer the reference called per frame (SURVEY.md §2a;
reference mount empty this session).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..env import pixels as _px
from ..env.pixels import RenderConfig, ray_constants_np
from ..physics import CartPoleParams, PhysState, pole_w

_ENV_BLOCK = 32  # envs per grid step (amortizes per-iteration overhead)


def renderable(cfg: RenderConfig, num_envs: int) -> bool:
    """Kernel coverage: lane-aligned pixel count, block-aligned batch."""
    return (cfg.width * cfg.height) % 128 == 0 and \
        num_envs % _ENV_BLOCK == 0


def _all_camera_rows(cfg: RenderConfig):
    """Ray constants for every camera, concatenated on the pixel axis:
    9 rows of shape (1, ncam * H * W) — eye xyz, direction xyz,
    reciprocal-direction xyz. The per-camera eye becomes a row too so
    one kernel call covers cameras with different viewpoints."""
    npx = cfg.width * cfg.height
    per = [ray_constants_np(cam, cfg.width, cfg.height)
           for cam in cfg.cameras]
    rows = []
    for i in range(3):
        rows.append(np.concatenate(
            [np.full((1, npx), pc[0][i], np.float32) for pc in per], 1))
    for group in (1, 2):
        for i in range(3):
            rows.append(np.concatenate([pc[group][i] for pc in per], 1))
    return rows  # [ex, ey, ez, dx, dy, dz, inv_dx, inv_dy, inv_dz]


def _render_kernel(p: CartPoleParams, cfg: RenderConfig,
                   cx_ref, cy_ref, cz_ref, ux_ref, uy_ref, uz_ref,
                   ex_ref, ey_ref, ez_ref,
                   dx_ref, dy_ref, dz_ref, ix_ref, iy_ref, iz_ref,
                   r_ref, g_ref, b_ref):
    # In-kernel compute is f32 regardless of cfg.dtype: Mosaic rejects
    # bf16 vector comparisons (verified on hardware), and the kernel is
    # VMEM-resident anyway — bf16's XLA-path win is halved HBM traffic,
    # which the kernel has already eliminated.
    eye = (ex_ref[:], ey_ref[:], ez_ref[:])
    rays = [ref[:] for ref in (dx_ref, dy_ref, dz_ref,
                               ix_ref, iy_ref, iz_ref)]
    cols = [ref[:] for ref in (cx_ref, cy_ref, cz_ref,
                               ux_ref, uy_ref, uz_ref)]
    r, g, b = _px.shade_components(p, cfg, eye, *rays, *cols)
    r_ref[:] = r
    g_ref[:] = g
    b_ref[:] = b


def pallas_render_all(p: CartPoleParams, cfg: RenderConfig, num_envs: int,
                      interpret: bool = False):
    """Builder: fn(phys) -> (B, H, W, C) f32, all cameras (+grayscale)
    stacked on channels — the kernel twin of
    env/pixels.py::render_all_cameras (same shade_components math)."""
    if not renderable(cfg, num_envs):
        raise ValueError("shape not coverable by the render kernel")
    npx = cfg.width * cfg.height
    ncam = len(cfg.cameras)
    total = ncam * npx
    b = num_envs
    be = _ENV_BLOCK
    rows_np = _all_camera_rows(cfg)

    kernel = functools.partial(_render_kernel, p, cfg)
    env_col = pl.BlockSpec((be, 1), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    ray_row = pl.BlockSpec((1, total), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    out_rows = pl.BlockSpec((be, total), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(b // be,),
        out_shape=(jax.ShapeDtypeStruct((b, total), jnp.float32),) * 3,
        in_specs=[env_col] * 6 + [ray_row] * 9,
        out_specs=(out_rows,) * 3,
        interpret=interpret,
    )

    def run(phys: PhysState):
        sx, sy = phys.s[..., 0], phys.s[..., 1]
        w = pole_w(p, sx, sy)
        cols = [phys.pos[..., 0], phys.pos[..., 1], phys.pos[..., 2],
                sx, sy, w]
        args = [c.astype(jnp.float32)[:, None] for c in cols]
        args += [jnp.asarray(r) for r in rows_np]
        r, g, bl = call(*args)
        views = []
        for c in range(ncam):
            seg = slice(c * npx, (c + 1) * npx)
            img = jnp.stack([r[:, seg], g[:, seg], bl[:, seg]],
                            axis=-1).reshape(b, cfg.height, cfg.width, 3)
            views.append(jnp.mean(img, -1, keepdims=True)
                         if cfg.grayscale else img)
        return jnp.concatenate(views, axis=-1)

    return run
