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


# ---------------------------------------------------------------------------
# Whole-observation render kernel: every repeat x camera frame of one
# env.step, plus the frame-diff encode and uint8 quantization, in ONE
# pallas_call.
#
# Round-4 trace at the 570k pixel-DDPG config (docs/design.md §15): the
# 48 per-camera-per-repeat render calls cost 10.2 ms of the ~29 ms
# device-busy train call, and the obs-assembly elementwise downstream
# (frame stack, diff encode, quantize) re-reads the ~113 MB of f32
# frame intermediates the render kernels wrote per env-step — together
# the largest cost block of config 4's training path. This kernel
# renders all R repeats (their phys snapshots arrive as 6R env-state
# columns) for all cameras (ray/static rows concatenated on the pixel
# axis — shade_components broadcasts eye rows natively), computes the
# frame-diff planes and the uint8 quantization IN VMEM, and writes only
# the final (B, H*W) obs planes: the f32 frame intermediates never
# touch HBM, and 6 pallas dispatches + a dozen elementwise fusions per
# env-step collapse to one call.
#
# Quantization matches the XLA twin bitwise: clip(v*255+0.5, 0, 255)
# then truncate — Mosaic rejects a direct f32->u8 cast but the
# f32->i32->u8 chain truncates identically (probed on hardware).
# ---------------------------------------------------------------------------


def obs_renderable(p: CartPoleParams, cfg: RenderConfig,
                   num_envs: int) -> bool:
    """Kernel coverage for the whole-obs render: per-camera pixel count
    lane-aligned (the in-kernel camera slices must land on lane
    boundaries), sublane-aligned batch."""
    return (cfg.width * cfg.height) % 128 == 0 and \
        num_envs % _ENV_BLOCK == 0


def _render_obs_kernel(p: CartPoleParams, cfg: RenderConfig, dt, gray,
                       repeats, ncam, *refs):
    """One env block: 6R env-state columns (R repeat snapshots), eye/
    ray/static rows (cameras concat on the pixel axis), out the final
    per-(slot, camera, channel) obs planes — frame-diff-encoded and
    quantized per RenderConfig."""
    import numpy as np

    f = np.float32
    nch = 1 if gray else 3
    n_out = repeats * ncam * nch
    ins, outs = refs[:len(refs) - n_out], refs[len(refs) - n_out:]
    ncols = 6 * repeats
    cols = [ref[:].astype(dt) for ref in ins[:ncols]]
    eye = tuple(ref[:].astype(dt) for ref in ins[ncols:ncols + 3])
    rays = [ref[:].astype(dt) for ref in ins[ncols + 3:ncols + 9]]
    static = tuple(ref[:].astype(dt) for ref in ins[ncols + 9:])
    hw = cfg.width * cfg.height

    frames = []   # per repeat: tuple of nch (be, ncam*hw) planes
    for r in range(repeats):
        frames.append(_px.shade_components(
            p, cfg, eye, *rays, static, *cols[6 * r:6 * r + 6], gray=gray))
    if cfg.frame_diff:
        # [latest, encoded consecutive diffs] — the twin of
        # env/cartpole.py::_stack_diff_obs, computed before quantization.
        g = f(0.5 * cfg.frame_diff_gain)
        slots = [frames[-1]]
        for a, b in zip(frames[:-1], frames[1:]):
            slots.append(tuple(
                jnp.clip(g * (pb - pa) + f(0.5), f(0.0), f(1.0))
                for pa, pb in zip(a, b)))
    else:
        slots = frames

    i = 0
    for planes in slots:
        for cam in range(ncam):
            for ch in range(nch):
                v = planes[ch][:, cam * hw:(cam + 1) * hw].astype(
                    jnp.float32)
                if cfg.obs_uint8:
                    q = jnp.clip(v * f(255.0) + f(0.5), f(0.0), f(255.0))
                    outs[i][:] = q.astype(jnp.int32).astype(jnp.uint8)
                else:
                    outs[i][:] = v
                i += 1


def pallas_render_obs(p: CartPoleParams, cfg: RenderConfig, num_envs: int,
                      interpret: bool = False):
    """Builder: fn([phys_repeat_0, ..., phys_repeat_{R-1}]) -> the final
    (B, H, W, C) observation of one env.step (C = channels x cameras x
    repeats, uint8 when cfg.obs_uint8) — numerically the
    render/_stack_diff_obs/stack_obs XLA pipeline of env/cartpole.py,
    executed as one VMEM pass."""
    import numpy as np

    if not obs_renderable(p, cfg, num_envs):
        raise ValueError("shape not coverable by the obs render kernel")
    repeats = p.action_repeats
    ncam = len(cfg.cameras)
    gray = cfg.grayscale
    nch = 1 if gray else 3
    hw = cfg.width * cfg.height
    npx = ncam * hw
    b, be = num_envs, _ENV_BLOCK
    dt = jnp.float32   # see pallas_render: in-kernel compute stays f32

    eyes, drows, irows, statics = [], [], [], []
    for cam in cfg.cameras:
        eye, dcomp, icomp = ray_constants_np(cam, cfg.width, cfg.height)
        eyes.append(eye)
        drows.append(dcomp)
        irows.append(icomp)
        rows_np, _ = _px.static_rows_np(cam, cfg, gray)
        statics.append(rows_np)
    eye_rows = [np.concatenate(
        [np.full((1, hw), e[i], np.float32) for e in eyes], axis=1)
        for i in range(3)]
    ray_rows = ([np.concatenate([d[i] for d in drows], axis=1)
                 for i in range(3)]
                + [np.concatenate([ic[i] for ic in irows], axis=1)
                   for i in range(3)])
    nstatic = len(statics[0])
    static_rows = [np.concatenate([s[j] for s in statics], axis=1)
                   for j in range(nstatic)]

    odtype = jnp.uint8 if cfg.obs_uint8 else jnp.float32
    n_out = repeats * ncam * nch
    kernel = functools.partial(_render_obs_kernel, p, cfg, dt, gray,
                               repeats, ncam)
    env_col = pl.BlockSpec((be, 1), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, npx), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    out_rows = pl.BlockSpec((be, hw), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(b // be,),
        out_shape=(jax.ShapeDtypeStruct((b, hw), odtype),) * n_out,
        in_specs=[env_col] * (6 * repeats) + [row] * (9 + nstatic),
        out_specs=(out_rows,) * n_out,
        interpret=interpret,
    )
    const_rows = [jnp.asarray(r) for r in eye_rows + ray_rows + static_rows]

    def run(phys_list):
        if len(phys_list) != repeats:
            raise ValueError(f"need {repeats} repeat snapshots, got "
                             f"{len(phys_list)}")
        args = []
        for ph in phys_list:
            sx, sy = ph.s[..., 0], ph.s[..., 1]
            w = pole_w(p, sx, sy)
            for c in (ph.pos[..., 0], ph.pos[..., 1], ph.pos[..., 2],
                      sx, sy, w):
                args.append(c.astype(jnp.float32)[:, None])
        planes = call(*args, *const_rows)
        return jnp.stack(planes, axis=-1).reshape(
            b, cfg.height, cfg.width, n_out)

    return run
