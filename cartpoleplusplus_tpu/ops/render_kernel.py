"""Pallas TPU kernel: the per-pixel raycast renderer in one VMEM pass.

Round-1/2 measurement: the XLA renderer is HBM-traffic-bound — every
(B, H, W, 3)-shaped intermediate of the ray cast spills ~28 MB per
camera at 1024 envs, and the pixel env tops out at 240-350k env-steps/s
while the VPU sits mostly idle. This kernel evaluates the ENTIRE
raycast + shade pipeline (env/pixels.py::shade_components — the single
math source, unchanged) on (env-block, n_pixels) VMEM tiles: env
components broadcast down sublanes, per-pixel ray constants along
lanes, zero intermediate HBM traffic. Only the final RGB rows are
written out.

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

from ..env.pixels import CameraConfig, RenderConfig, ray_constants_np
from ..env import pixels as _px
from ..physics import CartPoleParams, PhysState, pole_w

_ENV_BLOCK = 8  # envs per grid step (f32 sublane tile)


def renderable(cfg: RenderConfig, num_envs: int) -> bool:
    """Kernel coverage: lane-aligned pixel count, sublane-aligned batch."""
    return (cfg.width * cfg.height) % 128 == 0 and \
        num_envs % _ENV_BLOCK == 0


def _render_cam_kernel(p: CartPoleParams, cfg: RenderConfig, eye, dt,
                       gray, *refs):
    """One camera, one env block: inputs are 6 env-state columns, 6 ray
    rows and the static precomputed rows (env/pixels.py::static_rows_np
    — ground/sky, slab half-widths, face-normal Lambert), outputs the
    composited channel planes (1 luminance plane when `gray` — a third
    of the HBM writes of RGB)."""
    n_out = 1 if gray else 3
    ins, outs = refs[:len(refs) - n_out], refs[len(refs) - n_out:]
    cols = [ref[:].astype(dt) for ref in ins[:6]]
    rays = [ref[:].astype(dt) for ref in ins[6:12]]
    static = tuple(ref[:].astype(dt) for ref in ins[12:])
    chans = _px.shade_components(p, cfg, eye, *rays, static, *cols,
                                 gray=gray)
    for out, chan in zip(outs, chans):
        out[:] = chan.astype(jnp.float32)


def pallas_render(p: CartPoleParams, cfg: RenderConfig, cam: CameraConfig,
                  num_envs: int, interpret: bool = False):
    """Builder: fn(phys) -> (B, H, W, 3) f32 for one camera, kernelized.

    Same contract as env/pixels.py::render (and the same math — both
    call shade_components); only the execution strategy differs.
    """
    if not renderable(cfg, num_envs):
        raise ValueError("shape not coverable by the render kernel")
    npx = cfg.width * cfg.height
    b = num_envs
    be = _ENV_BLOCK
    # In-kernel compute is f32 regardless of cfg.dtype: Mosaic rejects
    # bf16 vector comparisons (arith.cmpf on the packed 8x128x2 layout,
    # verified on hardware), and the kernel is VMEM-resident anyway —
    # bf16's win on the XLA path is halved HBM traffic, which the kernel
    # has already eliminated.
    dt = jnp.float32
    eye, dcomp, icomp = ray_constants_np(cam, cfg.width, cfg.height)

    gray = cfg.grayscale
    nch = 1 if gray else 3
    rows_np, _ = _px.static_rows_np(cam, cfg, gray)
    kernel = functools.partial(_render_cam_kernel, p, cfg, eye, dt, gray)
    env_col = pl.BlockSpec((be, 1), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    ray_row = pl.BlockSpec((1, npx), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    out_rows = pl.BlockSpec((be, npx), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(b // be,),
        out_shape=(jax.ShapeDtypeStruct((b, npx), jnp.float32),) * nch,
        in_specs=[env_col] * 6 + [ray_row] * (6 + len(rows_np)),
        out_specs=(out_rows,) * nch,
        interpret=interpret,
    )

    def run(phys: PhysState):
        sx, sy = phys.s[..., 0], phys.s[..., 1]
        w = pole_w(p, sx, sy)
        cols = [phys.pos[..., 0], phys.pos[..., 1], phys.pos[..., 2],
                sx, sy, w]
        args = [c.astype(jnp.float32)[:, None] for c in cols]
        args += [jnp.asarray(c) for c in dcomp + icomp]
        args += [jnp.asarray(c) for c in rows_np]
        chans = call(*args)
        return jnp.stack(chans, axis=-1).reshape(
            b, cfg.height, cfg.width, nch)

    return run


def pallas_render_all(p: CartPoleParams, cfg: RenderConfig, num_envs: int,
                      interpret: bool = False):
    """All cameras stacked on channels — kernel twin of
    env/pixels.py::render_all_cameras. Grayscale composites luminance
    inside the kernel (one plane per camera) rather than averaging
    three rendered channels afterwards."""
    fns = [pallas_render(p, cfg, cam, num_envs, interpret=interpret)
           for cam in cfg.cameras]

    def run(phys: PhysState):
        return jnp.concatenate([f(phys) for f in fns], axis=-1)

    return run
