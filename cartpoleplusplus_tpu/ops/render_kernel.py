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


def _pick_chunks(npx: int, max_chunks: int = 6):
    """Static lane-aligned pixel chunks for in-kernel row-band culling:
    the largest chunk count <= max_chunks that divides npx into
    128-multiples. [(0, npx)] means culling is off (one full chunk)."""
    for n in range(max_chunks, 1, -1):
        if npx % n == 0 and (npx // n) % 128 == 0:
            step = npx // n
            return [(i * step, (i + 1) * step) for i in range(n)]
    return [(0, npx)]


def _row_band(p: CartPoleParams, cfg: RenderConfig, basis,
              cx, cy, cz, sx, sy, w):
    """Conservative screen-row interval containing EVERY body pixel of
    the env block, as two scalars (row_lo, row_hi).

    The cart is bounded by its circumscribed sphere and the pole capsule
    by its two end spheres (a capsule is the convex hull of its end
    spheres, and the projection of a convex hull is the hull of the
    projections, so the row interval is the union of the end-sphere
    intervals). For a sphere of radius R at camera-frame depth a and
    vertical offset c, every point Q satisfies |ys(Q) - ys(C)| <=
    R*(1 + |c|/a) / ((a - R) * tan_u) (triangle inequality on
    ys = c/(a*tan_u) with a_Q >= a - R) — computed exactly below, so
    the bound is conservative for ANY pose; near/behind-camera spheres
    (a - R <= 0.2) fall back to the full frame. +-1.5 rows of margin
    absorb the pixel-center offset and f32 rounding."""
    import numpy as np

    f = np.float32
    (ex, ey, ez), (fx, fy, fz), _right, (ux_, uy_, uz_), _tr, tu = basis
    hh = f(cfg.height)
    eps = f(0.2)

    def sphere_band(px_, py_, pz_, rr):
        vx = px_ - ex
        vy = py_ - ey
        vz = pz_ - ez
        a = vx * fx + vy * fy + vz * fz
        c = vx * ux_ + vy * uy_ + vz * uz_
        safe = (a - rr) > eps
        ag = jnp.maximum(a - rr, eps)
        am = jnp.maximum(a, eps)
        ys_c = c / (am * tu)
        dy = rr * (f(1.0) + jnp.abs(c) / am) / (ag * tu)
        lo = jnp.where(safe, ys_c - dy, f(-4.0))
        hi = jnp.where(safe, ys_c + dy, f(4.0))
        return lo, hi

    rc = f(float(np.linalg.norm(np.asarray(cfg.cart_half_extents,
                                           np.float32))))
    rp = f(cfg.pole_radius)
    ll = f(p.pole_length)
    az = cz + f(p.pivot_height)
    b1 = sphere_band(cx, cy, cz, rc)
    b2 = sphere_band(cx, cy, az, rp)
    b3 = sphere_band(cx + ll * sx, cy + ll * sy, az + ll * w, rp)
    ys_lo = jnp.minimum(jnp.minimum(b1[0], b2[0]), b3[0])
    ys_hi = jnp.maximum(jnp.maximum(b1[1], b2[1]), b3[1])
    # row = (1 - ys) * H/2 - 0.5: larger ys = higher on screen = smaller
    # row index, so ys_hi bounds row_lo and vice versa.
    row_lo = (f(1.0) - ys_hi) * hh * f(0.5) - f(0.5)
    row_hi = (f(1.0) - ys_lo) * hh * f(0.5) - f(0.5)
    return jnp.min(row_lo) - f(1.5), jnp.max(row_hi) + f(1.5)


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


def _render_cam_cull_kernel(p: CartPoleParams, cfg: RenderConfig, eye,
                            dt, gray, basis, chunk, *refs):
    """Row-band-culled variant: grid (env_blocks, pixel_chunks), the
    chunk's ray/static/output blocks arrive pre-sliced by BlockSpec.

    The bodies cover a small screen-row band (cart ~6 px, pole
    ~20-40 px of a 48-px frame) while the background is precomputed
    static rows, so each grid step computes a conservative row interval
    for its env block (_row_band) and shades ONLY when its pixel chunk
    intersects it — culled steps write the background rows directly.
    The chunk axis lives in the GRID, not unrolled in the body: Mosaic's
    backend crashes on two predicated shade regions in one kernel body
    (probed on hardware, round 5), and the grid form needs exactly one.
    Exactness: the band provably contains every body pixel, and outside
    it the composite IS the background (interpret parity tests +
    bench.py's hardware parity legs)."""
    import numpy as np

    f = np.float32
    n_out = 1 if gray else 3
    ins, outs = refs[:len(refs) - n_out], refs[len(refs) - n_out:]
    cols = [ref[:].astype(dt) for ref in ins[:6]]
    rays = [ref[:].astype(dt) for ref in ins[6:12]]
    static = tuple(ref[:].astype(dt) for ref in ins[12:])
    be = cols[0].shape[0]

    row_lo, row_hi = _row_band(p, cfg, basis, *cols)
    px0 = pl.program_id(1) * chunk
    r0 = (px0 // cfg.width).astype(jnp.float32)
    r1 = ((px0 + chunk - 1) // cfg.width).astype(jnp.float32)
    cond = (row_hi >= r0) & (row_lo <= r1)

    @pl.when(cond)
    def _shade():
        chans = _px.shade_components(p, cfg, eye, *rays, static, *cols,
                                     gray=gray)
        for out, chan in zip(outs, chans):
            out[:] = chan.astype(jnp.float32)

    @pl.when(jnp.logical_not(cond))
    def _background():
        for i in range(n_out):
            outs[i][:] = jnp.broadcast_to(
                static[1 + i].astype(jnp.float32), (be, chunk))


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
    # Row-band culling OFF by default: a MEASURED NEGATIVE on this chip
    # (round 5). The grid form (chunk axis in the pallas grid — the only
    # form Mosaic compiles, see _render_cam_cull_kernel) halves e2e
    # pixel training throughput (2048/block: 395k vs 736k env-steps/s;
    # 4096: 420k vs 828k): with only 6 chunks per 48x48 frame the
    # per-grid-step window DMAs and pipeline breaks cost far more than
    # the skipped shades, and mixed-pose env blocks rarely cull much.
    # Kept as an opt-in (CARTPOLE_RENDER_CULL=1) with exact-parity
    # tests — the conservative-projection machinery is correct, the
    # economics are not (docs/design.md §18).
    import os
    if os.environ.get("CARTPOLE_RENDER_CULL", "0") == "1":
        chunks = _pick_chunks(npx)
    else:
        chunks = [(0, npx)]
    if len(chunks) > 1:
        chunk = npx // len(chunks)
        basis = _px.camera_basis_np(cam, cfg.width, cfg.height)
        kernel = functools.partial(_render_cam_cull_kernel, p, cfg, eye,
                                   dt, gray, basis, chunk)
        env_col = pl.BlockSpec((be, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM)
        ray_row = pl.BlockSpec((1, chunk), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM)
        out_rows = pl.BlockSpec((be, chunk), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kernel,
            grid=(b // be, len(chunks)),
            out_shape=(jax.ShapeDtypeStruct((b, npx),
                                            jnp.float32),) * nch,
            in_specs=[env_col] * 6 + [ray_row] * (6 + len(rows_np)),
            out_specs=(out_rows,) * nch,
            interpret=interpret,
        )
    else:
        kernel = functools.partial(_render_cam_kernel, p, cfg, eye, dt,
                                   gray)
        env_col = pl.BlockSpec((be, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        ray_row = pl.BlockSpec((1, npx), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
        out_rows = pl.BlockSpec((be, npx), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kernel,
            grid=(b // be,),
            out_shape=(jax.ShapeDtypeStruct((b, npx),
                                            jnp.float32),) * nch,
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
# Batched-repeat frames kernel: all R repeat frames of one env.step per
# camera in ONE pallas_call, repeats stacked as virtual envs.
#
# Round-4 trace at the 570k pixel-DDPG config (docs/design.md §15): the
# 48 per-camera-per-repeat render dispatches cost 10.2 ms of the ~29 ms
# device-busy train call. Two rejected designs measured this round
# (BASELINE.md round-5): (a) one mega-kernel computing all 3 repeats x
# 2 cameras + frame-diff + uint8 quantize in-body ran the raycast 40%
# SLOWER per pixel (14.2 vs 10.2 ms/call — 3 concurrent shade
# pipelines at doubled pixel width overflow Mosaic's vector budget),
# and (b) in-kernel f32->i32->u8 stores cost ~+4 ms/call (byte-tile
# sublane packing). This design keeps the per-grid-step body EXACTLY
# the proven single-camera shade (npx = H*W) and batches the R repeat
# snapshots on the ENV axis instead: same total VPU work, 2R-fold
# fewer dispatches (6 -> 2 per env-step at R=3), zero body growth.
# The frame-diff / quantize / stack epilogue stays in XLA, where it
# fuses with the auto-reset select (env/cartpole.py reuses its
# existing assembly code on the returned frames — parity by
# construction).
# ---------------------------------------------------------------------------


def obs_renderable(p: CartPoleParams, cfg: RenderConfig,
                   num_envs: int) -> bool:
    """Kernel coverage for the batched-repeat frames render."""
    return renderable(cfg, num_envs * p.action_repeats)


def pallas_render_frames(p: CartPoleParams, cfg: RenderConfig,
                         num_envs: int, interpret: bool = False):
    """Builder: fn([phys_repeat_0, ..., phys_repeat_{R-1}]) -> list of R
    frames, each (B, H, W, channels*cameras) f32 in [0, 1] — exactly
    what env/cartpole.py's repeat loop produced with R*cameras separate
    render calls, in `cameras` calls total."""
    repeats = p.action_repeats
    b = num_envs
    rb = repeats * b
    if not obs_renderable(p, cfg, num_envs):
        raise ValueError("shape not coverable by the frames render kernel")
    cam_fns = [pallas_render(p, cfg, cam, rb, interpret=interpret)
               for cam in cfg.cameras]

    def run(phys_list):
        if len(phys_list) != repeats:
            raise ValueError(f"need {repeats} repeat snapshots, got "
                             f"{len(phys_list)}")
        stacked = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0),
                               *phys_list)
        views = [fn(stacked) for fn in cam_fns]       # (RB, H, W, nch)
        return [jnp.concatenate([v[r * b:(r + 1) * b] for v in views],
                                axis=-1)
                for r in range(repeats)]              # R x (B, H, W, nch*nc)

    return run
