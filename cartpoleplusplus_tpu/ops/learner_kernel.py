"""Pallas TPU kernel: the ENTIRE DDPG update phase as one kernel call.

Round-2 finding (docs/design.md §8d, BASELINE.md decomposition): at the
headline cadence the 16-update learner chain costs ~7.5-9 ms of the
12.8 ms train step and is bound by the SERIAL STREAM of compiled ops —
every XLA fusion boundary round-trips its (batch, 256) intermediate
through HBM (~20 us each at batch 8192), and a TPU core runs one HLO at
a time, so neither dtype nor batch shape moves the number. The fix is
structural: run all K updates inside ONE Pallas kernel with every
parameter, Adam moment, target network and gradient accumulator
resident in VMEM for the whole phase, streaming only the presampled
minibatches from HBM. Intermediate HBM traffic drops to zero and the
op stream collapses to a single HLO.

Reference counterpart: the per-step TF session calls of
`ddpg_cartpole.py` (critic_train, actor_train, target_update —
SURVEY.md §3.3; reference mount empty this session). The semantics
here are exactly agents/ddpg.py::_update_once with presampled batches:
per update k — critic TD step (Adam), actor step through the UPDATED
critic (Adam), Polyak targets — K times sequentially.

Grid: (K, 2, NB) — NB batch blocks per phase; phase 0 = critic
(accumulate critic grads over blocks, Adam at the last block), phase 1
= actor (accumulate actor grads via dQ/da through the updated critic,
Adam + Polyak at the last block). Working parameters/moments live in
VMEM scratch for the whole grid (the policy_rollout state pattern),
initialized from the input refs at the first step and flushed to the
output refs at the last.

Layout — BATCH-MAJOR, unlike the feature-major rollout kernels:
activations are (block, features) with features on the lane axis, so
  * biases and LayerNorm params are (1, H) ROWS, packed 3-per-layer
    into one (8, H) buffer per network — a (H, 1) column would be
    lane-padded to (H, 128), 131 KB of VMEM each, 56 buffers;
  * LayerNorm reduces over lanes, grad reductions over sublanes;
  * the critic's action concat (a lane-axis concatenate, rejected by
    Mosaic) becomes a SPLIT matmul: z1 = h0 W1h + a W1a;
  * heads are stored transposed (8, H) and applied/differentiated with
    dot_general NT/TN contractions (probed on hardware) so no (H, 8)
    buffer gets lane-padded.
Head rows beyond the true action/Q width stay exactly zero through
training: their forward contribution is zero, the masked loss gives
them zero gradients, and Adam maps zero moments + zero gradient to a
zero update.

The numerical twin is `update_phase_math` below — identical
componentwise math on plain jnp arrays via the SAME phase-block
functions — which tests/test_learner_kernel.py pins against
agents/ddpg.py's XLA update scan (jax.grad + optax) AND against this
kernel in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-6       # flax.linen.LayerNorm default epsilon
_ADAM_B1 = 0.9       # optax.adam defaults
_ADAM_B2 = 0.999
_ADAM_EPS = 1e-8


# --------------------------------------------------------------------------
# Batch-major MLP math (componentwise; shared verbatim by the kernel and
# the jnp twin — the same only-numpy-constants rule as physics/dynamics).
# Activations are (B, F) with the batch on sublanes; weights are flax-
# native (F_in, H); biases/LN params are (1, H) rows.
# --------------------------------------------------------------------------

def _dot(a, b):
    """Standard (B, K) @ (K, N)."""
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_tn(a, b):
    """a^T b: contract the sublane (batch) axis — (B, F), (B, H) ->
    (F, H). The dW form."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_nt(a, b):
    """a b^T: contract the lane axis — (B, H), (F, H) -> (B, F). The
    dH / transposed-head form."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _ln_relu(z, s, t):
    """LayerNorm over lanes (flax fast-variance formula) + affine +
    relu. Returns (activation, xhat, inv, y)."""
    mu = jnp.mean(z, axis=1, keepdims=True)
    var = jnp.mean(z * z, axis=1, keepdims=True) - mu * mu
    inv = jax.lax.rsqrt(var + np.float32(_LN_EPS))
    xh = (z - mu) * inv
    y = xh * s + t
    return jnp.maximum(y, 0.0), xh, inv, y


def _ln_relu_bwd(dh, z, s, t):
    """Backward through relu+affine+LayerNorm given upstream dh and the
    saved pre-LN z (LN intermediates recomputed — a few VPU ops instead
    of 3x the VMEM residency). Returns (dz, ds, dt) with ds/dt (1, H)."""
    _, xh, inv, y = _ln_relu(z, s, t)
    dy = dh * (y > 0.0).astype(jnp.float32)
    ds = jnp.sum(dy * xh, axis=0, keepdims=True)
    dt = jnp.sum(dy, axis=0, keepdims=True)
    dxh = dy * s
    dz = inv * (dxh - jnp.mean(dxh, axis=1, keepdims=True)
                - xh * jnp.mean(dxh * xh, axis=1, keepdims=True))
    return dz, ds, dt


def _rows_height(n_layers: int) -> int:
    """Sublane-padded height of the packed (b, scale, bias)-rows buffer."""
    return max(8, -(-3 * n_layers // 8) * 8)


def _row(rows, i: int, width: int):
    """Row i of the packed rows buffer, trimmed to the layer width
    (no trim — and no lane slice — when widths are uniform)."""
    r = rows[i:i + 1, :]
    return r if width == rows.shape[1] else r[:, :width]


def _pad_row(d, width: int):
    """Zero-pad a (1, h) row gradient to the pack width (lane concat —
    only reached for non-uniform hidden sizes, i.e. interpret tests)."""
    if d.shape[1] == width:
        return d
    return jnp.concatenate(
        [d, jnp.zeros((1, width - d.shape[1]), jnp.float32)], axis=1)


def _lane0_mask(b: int):
    """(B, 8) f32 mask selecting lane 0 — the real Q column."""
    return (jax.lax.broadcasted_iota(jnp.int32, (b, 8), 1) == 0
            ).astype(jnp.float32)


# --- plain MLP (torso + linear 8-row padded head): the ActorMLP and
# --- QNetMLP body (identical flax tree structure, flatten_actor layout) -----

def mlp_fwd(obs, flat, hidden):
    """flat = [W0..W_{n-1}, WhT (8, H_last), rows (R, Hmax), bh (1, 8)].
    Returns (pre (B, 8) head pre-activations with pad lanes exactly 0,
    residue)."""
    ws, wh, rows, bh = flat[:-3], flat[-3], flat[-2], flat[-1]
    h, saved = obs, []
    for i, hd in enumerate(hidden):
        z = _dot(h, ws[i]) + _row(rows, 3 * i, hd)
        saved.append((h, z))
        h, _, _, _ = _ln_relu(z, _row(rows, 3 * i + 1, hd),
                              _row(rows, 3 * i + 2, hd))
    pre = _dot_nt(h, wh) + bh
    return pre, (saved, h)


def mlp_bwd(dpre, flat, hidden, residue):
    """Grads for upstream d(pre-activation) (B, 8; pad lanes zero).
    Returns a flat grad list mirroring `flat`."""
    ws, wh, rows, bh = flat[:-3], flat[-3], flat[-2], flat[-1]
    saved, h_last = residue
    dwh = _dot_tn(dpre, h_last)
    dbh = jnp.sum(dpre, axis=0, keepdims=True)
    dh = _dot(dpre, wh)
    dws = [None] * len(hidden)
    drows = [None] * (3 * len(hidden))
    for i in reversed(range(len(hidden))):
        hd = hidden[i]
        h_in, z = saved[i]
        dz, ds, dt = _ln_relu_bwd(dh, z, _row(rows, 3 * i + 1, hd),
                                  _row(rows, 3 * i + 2, hd))
        dws[i] = _dot_tn(h_in, dz)
        drows[3 * i] = _pad_row(jnp.sum(dz, axis=0, keepdims=True),
                                rows.shape[1])
        drows[3 * i + 1] = _pad_row(ds, rows.shape[1])
        drows[3 * i + 2] = _pad_row(dt, rows.shape[1])
        if i > 0:
            dh = _dot_nt(dz, ws[i])
    pad = rows.shape[0] - 3 * len(hidden)
    if pad:
        drows += [jnp.zeros((1, rows.shape[1]), jnp.float32)] * pad
    return dws + [dwh, jnp.concatenate(drows, axis=0), dbh]


# --- actor: MLP + tanh head (lanes 0..1 of the padded 8) --------------------

def actor_fwd(obs, flat, hidden):
    """Returns (a8 (B, 8) with lanes >= action_dim exactly 0, residue)."""
    pre, res = mlp_fwd(obs, flat, hidden)
    a = jnp.tanh(pre)
    return a, res + (a,)


def actor_bwd(da8, flat, hidden, residue):
    """Grads for upstream da8 (B, 8; pad lanes zero)."""
    saved, h_last, a = residue
    return mlp_bwd(da8 * (1.0 - a * a), flat, hidden, (saved, h_last))


# --- critic: W0(obs) -> split-matmul action inject -> torso -> head ---------

def critic_fwd(obs, act, flat, hidden):
    """flat = [W0, W1h, W1a (8, H1), W2.., WhT, rows, bh]; act is (B, 2)
    (replay actions) or (B, 8) (padded actor output, pad lanes zero).
    Returns (q8 (B, 8) with lanes >= 1 exactly 0, residue)."""
    w0, w1h, w1a = flat[0], flat[1], flat[2]
    ws_rest, wh, rows, bh = flat[3:-3], flat[-3], flat[-2], flat[-1]
    z0 = _dot(obs, w0) + _row(rows, 0, hidden[0])
    h0, _, _, _ = _ln_relu(z0, _row(rows, 1, hidden[0]),
                           _row(rows, 2, hidden[0]))
    wa = w1a if act.shape[1] == w1a.shape[0] else w1a[:act.shape[1], :]
    z1 = _dot(h0, w1h) + _dot(act, wa) + _row(rows, 3, hidden[1])
    h, _, _, _ = _ln_relu(z1, _row(rows, 4, hidden[1]),
                          _row(rows, 5, hidden[1]))
    saved = [(obs, z0), (h0, z1)]
    for i, hd in enumerate(hidden[2:], start=2):
        z = _dot(h, ws_rest[i - 2]) + _row(rows, 3 * i, hd)
        saved.append((h, z))
        h, _, _, _ = _ln_relu(z, _row(rows, 3 * i + 1, hd),
                              _row(rows, 3 * i + 2, hd))
    q = _dot_nt(h, wh) + bh
    return q, (saved, h, act)


def critic_bwd(dq8, flat, hidden, residue, need_param_grads: bool,
               need_daction: bool):
    """Backward through critic_fwd for upstream dq8 (B, 8; pad lanes
    zero). Returns (flat grad list or None, daction (B, 8) or None)."""
    w0, w1h, w1a = flat[0], flat[1], flat[2]
    ws_rest, wh, rows, bh = flat[3:-3], flat[-3], flat[-2], flat[-1]
    saved, h_last, act = residue
    n = len(hidden)
    wm = rows.shape[1]
    dwh = _dot_tn(dq8, h_last)
    dbh = jnp.sum(dq8, axis=0, keepdims=True)
    dh = _dot(dq8, wh)
    dws = [None] * n
    drows = [None] * (3 * n)
    for i in reversed(range(2, n)):
        h_in, z = saved[i]
        dz, ds, dt = _ln_relu_bwd(dh, z, _row(rows, 3 * i + 1, hidden[i]),
                                  _row(rows, 3 * i + 2, hidden[i]))
        dws[i] = _dot_tn(h_in, dz)
        drows[3 * i] = _pad_row(jnp.sum(dz, axis=0, keepdims=True), wm)
        drows[3 * i + 1] = _pad_row(ds, wm)
        drows[3 * i + 2] = _pad_row(dt, wm)
        dh = _dot_nt(dz, ws_rest[i - 2])
    # layer 1 (the split action-inject layer)
    h0, z1 = saved[1]
    dz1, ds1, dt1 = _ln_relu_bwd(dh, z1, _row(rows, 4, hidden[1]),
                                 _row(rows, 5, hidden[1]))
    daction = _dot_nt(dz1, w1a) if need_daction else None
    if not need_param_grads:
        return None, daction
    dw1h = _dot_tn(h0, dz1)
    dw1a = _dot_tn(act, dz1)
    if act.shape[1] < w1a.shape[0]:
        dw1a = jnp.concatenate(
            [dw1a, jnp.zeros((w1a.shape[0] - act.shape[1],
                              dw1a.shape[1]), jnp.float32)], axis=0)
    drows[3] = _pad_row(jnp.sum(dz1, axis=0, keepdims=True), wm)
    drows[4] = _pad_row(ds1, wm)
    drows[5] = _pad_row(dt1, wm)
    # layer 0
    dh0 = _dot_nt(dz1, w1h)
    obs_in, z0 = saved[0]
    dz0, ds0, dt0 = _ln_relu_bwd(dh0, z0, _row(rows, 1, hidden[0]),
                                 _row(rows, 2, hidden[0]))
    dw0 = _dot_tn(obs_in, dz0)
    drows[0] = _pad_row(jnp.sum(dz0, axis=0, keepdims=True), wm)
    drows[1] = _pad_row(ds0, wm)
    drows[2] = _pad_row(dt0, wm)
    pad = rows.shape[0] - 3 * n
    if pad:
        drows += [jnp.zeros((1, wm), jnp.float32)] * pad
    flat_g = ([dw0, dw1h, dw1a] + [dws[i] for i in range(2, n)]
              + [dwh, jnp.concatenate(drows, axis=0), dbh])
    return flat_g, daction


# --- the two phase blocks (shared by kernel and twin) ------------------------

def critic_phase_block(actor_t, critic, critic_t, obs, nobs, act, rew,
                       done, gamma: float, inv_batch: float, hidden):
    """Critic-TD gradient contribution of one batch block. rew/done are
    (B, 1). Returns (flat critic grads, loss contribution)."""
    a_next, _ = actor_fwd(nobs, actor_t, hidden)
    q_next, _ = critic_fwd(nobs, a_next, critic_t, hidden)
    y = rew + np.float32(gamma) * (1.0 - done) * q_next
    q, residue = critic_fwd(obs, act, critic, hidden)
    td = (q - y) * _lane0_mask(q.shape[0])
    dq = np.float32(2.0 * inv_batch) * td
    grads, _ = critic_bwd(dq, critic, hidden, residue,
                          need_param_grads=True, need_daction=False)
    return grads, np.float32(inv_batch) * jnp.sum(td * td)


def actor_phase_block(actor, critic, obs, inv_batch: float, hidden):
    """Actor gradient contribution of one batch block: d(-mean Q(s,
    pi(s)))/d(actor params) through the (already updated) critic.
    Returns (flat actor grads, loss contribution)."""
    a8, res_a = actor_fwd(obs, actor, hidden)
    q8, res_c = critic_fwd(obs, a8, critic, hidden)
    mask = _lane0_mask(q8.shape[0])
    dq = np.float32(-inv_batch) * mask
    _, daction = critic_bwd(dq, critic, hidden, res_c,
                            need_param_grads=False, need_daction=True)
    grads = actor_bwd(daction, actor, hidden, res_a)
    return grads, np.float32(-inv_batch) * jnp.sum(q8 * mask)


# --- Adam + Polyak (componentwise; optax.adam semantics) --------------------

def adam_step(p, m, v, g, t, lr):
    """One optax.adam step: returns (p', m', v'). t is the f32 step
    index AFTER this update (optax counts from 1); the bias-correction
    powers are computed as exp(t * log(beta)) — Mosaic has no dynamic-
    exponent pow, and the ulp difference is far below the moment noise.
    lr may be a static float or a traced f32 scalar (the in-kernel lr
    schedule, _sched_lr)."""
    if isinstance(lr, (int, float)):
        lr = np.float32(lr)
    m = np.float32(_ADAM_B1) * m + np.float32(1.0 - _ADAM_B1) * g
    v = np.float32(_ADAM_B2) * v + np.float32(1.0 - _ADAM_B2) * (g * g)
    bc1 = 1.0 - jnp.exp(t * np.float32(np.log(_ADAM_B1)))
    bc2 = 1.0 - jnp.exp(t * np.float32(np.log(_ADAM_B2)))
    p = p - lr * (m / bc1) / (jnp.sqrt(v / bc2)
                              + np.float32(_ADAM_EPS))
    return p, m, v


def _sched_lr(lr: float, sched, tk):
    """optax.linear_schedule twin for the in-kernel lr: sched =
    (end_frac, transition_steps) static floats or None (constant). tk
    is the f32 Adam step index AFTER the update, so the schedule count
    (gradient steps taken BEFORE it — what optax.scale_by_schedule
    sees) is tk - 1: lr(c) = lr + (lr*end_frac - lr) * min(c/T, 1)."""
    if sched is None:
        return np.float32(lr)
    end_frac, steps = sched
    frac = jnp.minimum((tk - 1.0) / np.float32(steps), 1.0)
    return np.float32(lr) + frac * np.float32(lr * end_frac - lr)


def polyak_flat(target_list, online_list, tau):
    """theta' <- theta' + tau (theta - theta') over flat operand lists."""
    return [t + np.float32(tau) * (o - t)
            for t, o in zip(target_list, online_list)]


def _with_mm_precision(call, mm_precision, args):
    """Trace the pallas_call under an explicit default matmul
    precision. None leaves the ambient setting (tests run 'highest' on
    CPU; hardware default is the Mosaic f32 multi-pass form).
    'bfloat16' makes every in-kernel dot a single MXU pass — the
    learner-quality question is the same one flax's dtype knob answers,
    measured per-agent on hardware before promoting any default."""
    if mm_precision is None:
        return call(*args)
    with jax.default_matmul_precision(mm_precision):
        return call(*args)


# --------------------------------------------------------------------------
# Flat operand lists <-> flax pytrees. The same flatten applies verbatim
# to optax Adam moment trees (they mirror the param tree structure), and
# every padded region is zero, which Adam/Polyak preserve.
# --------------------------------------------------------------------------

def actor_shapes(hidden, obs_dim: int):
    shapes, f_in = [], obs_dim
    for h in hidden:
        shapes.append((f_in, h))
        f_in = h
    return shapes + [(8, f_in), (_rows_height(len(hidden)), max(hidden)),
                     (1, 8)]


def critic_shapes(hidden, obs_dim: int, action_dim: int = 2):
    del action_dim  # the W1a inject block is always padded to 8 rows
    shapes = [(obs_dim, hidden[0]), (hidden[0], hidden[1]),
              (8, hidden[1])]
    f_in = hidden[1]
    for h in hidden[2:]:
        shapes.append((f_in, h))
        f_in = h
    return shapes + [(8, f_in), (_rows_height(len(hidden)), max(hidden)),
                     (1, 8)]


def _vec_row(v, width: int):
    """(h,) vector -> zero-padded (1, width) row."""
    if v.shape[0] == width:
        return v[None, :].astype(jnp.float32)
    return jnp.zeros((1, width), jnp.float32).at[0, :v.shape[0]].set(v)


def _pack_rows(vecs, n_layers: int, width: int):
    """Pack per-layer (b, scale, bias) vectors into the (R, width) rows
    buffer. Uniform widths (the production case) take the 2-op path —
    one stack, one sublane pad — since this runs every train step."""
    if all(v.shape[0] == width for v in vecs):
        rows = jnp.stack(vecs, axis=0).astype(jnp.float32)
    else:
        rows = jnp.concatenate([_vec_row(v, width) for v in vecs], axis=0)
    pad = _rows_height(n_layers) - 3 * n_layers
    if pad:
        rows = jnp.concatenate(
            [rows, jnp.zeros((pad, width), jnp.float32)], axis=0)
    return rows


def _head_ops(kernel, bias):
    """(H, out) head -> ((8, H) transposed zero-padded weight, (1, 8)
    padded bias)."""
    wt = jnp.transpose(kernel)
    wh = jnp.zeros((8, wt.shape[1]), jnp.float32).at[:wt.shape[0]].set(wt)
    return wh, _vec_row(bias, 8)


def flatten_actor(params, hidden):
    """ActorMLP tree (params or same-structure Adam moments) -> flat
    operand list [W0..W_{n-1}, WhT, rows, bh]."""
    torso = params["params"]["_Torso_0"]
    wm = max(hidden)
    ws, vecs = [], []
    for i, _ in enumerate(hidden):
        d, ln = torso[f"Dense_{i}"], torso[f"LayerNorm_{i}"]
        ws.append(jnp.asarray(d["kernel"], jnp.float32))
        vecs += [d["bias"], ln["scale"], ln["bias"]]
    head = params["params"]["Dense_0"]
    wh, bh = _head_ops(head["kernel"], head["bias"])
    return ws + [wh, _pack_rows(vecs, len(hidden), wm), bh]


def unflatten_actor(flat, hidden, action_dim: int = 2):
    ws, wh, rows, bh = flat[:-3], flat[-3], flat[-2], flat[-1]
    torso = {}
    for i, hd in enumerate(hidden):
        torso[f"Dense_{i}"] = {"kernel": ws[i],
                               "bias": rows[3 * i, :hd]}
        torso[f"LayerNorm_{i}"] = {"scale": rows[3 * i + 1, :hd],
                                   "bias": rows[3 * i + 2, :hd]}
    return {"params": {"_Torso_0": torso,
                       "Dense_0": {
                           "kernel": jnp.transpose(wh[:action_dim]),
                           "bias": bh[0, :action_dim]}}}


def flatten_critic(params, hidden):
    """CriticMLP tree (or same-structure Adam moments) -> flat operand
    list [W0, W1h, W1a, W2.., WhT, rows, bh]. CriticMLP builds Dense_i/
    LayerNorm_i inline, Dense_1's kernel rows beyond hidden[0] are the
    action columns (models/nets.py concat order), Dense_{n} is the
    1-unit head."""
    p = params["params"]
    wm = max(hidden)
    h0 = hidden[0]
    k1 = jnp.asarray(p["Dense_1"]["kernel"], jnp.float32)
    w1a = jnp.zeros((8, k1.shape[1]), jnp.float32).at[
        :k1.shape[0] - h0].set(k1[h0:])
    ws = [jnp.asarray(p["Dense_0"]["kernel"], jnp.float32), k1[:h0], w1a]
    vecs = []
    for i, _ in enumerate(hidden):
        d, ln = p[f"Dense_{i}"], p[f"LayerNorm_{i}"]
        if i >= 2:
            ws.append(jnp.asarray(d["kernel"], jnp.float32))
        vecs += [d["bias"], ln["scale"], ln["bias"]]
    head = p[f"Dense_{len(hidden)}"]
    wh, bh = _head_ops(head["kernel"], head["bias"])
    return ws + [wh, _pack_rows(vecs, len(hidden), wm), bh]


def unflatten_critic(flat, hidden, action_dim: int = 2):
    w0, w1h, w1a = flat[0], flat[1], flat[2]
    ws_rest, wh, rows, bh = flat[3:-3], flat[-3], flat[-2], flat[-1]
    p = {}
    for i, hd in enumerate(hidden):
        if i == 0:
            kern = w0
        elif i == 1:
            kern = jnp.concatenate([w1h, w1a[:action_dim]], axis=0)
        else:
            kern = ws_rest[i - 2]
        p[f"Dense_{i}"] = {"kernel": kern, "bias": rows[3 * i, :hd]}
        p[f"LayerNorm_{i}"] = {"scale": rows[3 * i + 1, :hd],
                               "bias": rows[3 * i + 2, :hd]}
    p[f"Dense_{len(hidden)}"] = {"kernel": jnp.transpose(wh[:1]),
                                 "bias": bh[0, :1]}
    return {"params": p}


# --------------------------------------------------------------------------
# jnp twin of the whole kernel (tests pin it against agents/ddpg.py's
# XLA update scan AND against the kernel in interpret mode).
# --------------------------------------------------------------------------

def update_phase_math(actor, critic, actor_t, critic_t, m_a, v_a, m_c,
                      v_c, batches, t0, hidden, *, actor_lr, critic_lr,
                      gamma, tau, num_blocks: int = 1,
                      actor_grad_critic: str = "updated",
                      lr_schedule=None):
    """K sequential DDPG updates on flat operand lists, batch blocks
    processed exactly as the kernel grid does (grads accumulated over
    blocks, Adam at the last). batches: (obs (K, Bm, F), action
    (K, Bm, 2), reward (K, Bm), next_obs (K, Bm, F), done (K, Bm)).
    Returns (actor, critic, actor_t, critic_t, m_a, v_a, m_c, v_c,
    closs (K,), aloss (K,))."""
    k_updates, bm = batches[0].shape[0], batches[0].shape[1]
    blk = bm // num_blocks
    inv = 1.0 / bm
    closses, alosses = [], []
    for k in range(k_updates):
        obs, act, rew, nobs, done = (x[k] for x in batches)
        rew = rew[:, None]
        done = done.astype(jnp.float32)[:, None]
        tk = (t0 + k + 1).astype(jnp.float32)
        cg, closs = None, jnp.float32(0.0)
        for j in range(num_blocks):
            sl = slice(j * blk, (j + 1) * blk)
            g, ls = critic_phase_block(actor_t, critic, critic_t,
                                       obs[sl], nobs[sl], act[sl],
                                       rew[sl], done[sl], gamma, inv,
                                       hidden)
            cg = g if cg is None else [a + b for a, b in zip(cg, g)]
            closs = closs + ls
        pre_critic = critic
        new = [adam_step(p, m, v, g, tk,
                         _sched_lr(critic_lr, lr_schedule, tk))
               for p, m, v, g in zip(critic, m_c, v_c, cg)]
        critic, m_c, v_c = ([x[i] for x in new] for i in range(3))
        actor_critic = pre_critic if actor_grad_critic == "pre" else critic
        ag, aloss = None, jnp.float32(0.0)
        for j in range(num_blocks):
            sl = slice(j * blk, (j + 1) * blk)
            g, ls = actor_phase_block(actor, actor_critic, obs[sl], inv,
                                      hidden)
            ag = g if ag is None else [a + b for a, b in zip(ag, g)]
            aloss = aloss + ls
        new = [adam_step(p, m, v, g, tk,
                         _sched_lr(actor_lr, lr_schedule, tk))
               for p, m, v, g in zip(actor, m_a, v_a, ag)]
        actor, m_a, v_a = ([x[i] for x in new] for i in range(3))
        actor_t = polyak_flat(actor_t, actor, tau)
        critic_t = polyak_flat(critic_t, critic, tau)
        closses.append(closs)
        alosses.append(aloss)
    return (actor, critic, actor_t, critic_t, m_a, v_a, m_c, v_c,
            jnp.stack(closses), jnp.stack(alosses))


# --------------------------------------------------------------------------
# The kernel.
# --------------------------------------------------------------------------

def _update_kernel(hidden, na: int, nc: int, nb: int, gamma: float,
                   tau: float, actor_lr: float, critic_lr: float,
                   lr_schedule,
                   inv_bm: float, k_updates: int, merged: bool, *refs):
    n_par = 4 * na + 4 * nc
    obs_ref, nobs_ref, act_ref, rew_ref, done_ref = refs[:5]
    par_in = refs[5:5 + n_par]
    t0_ref = refs[5 + n_par]
    outs = refs[6 + n_par:6 + 2 * n_par]
    losses_ref = refs[6 + 2 * n_par]
    scratch = refs[7 + 2 * n_par:]
    par_s = scratch[:n_par]
    acc_c = scratch[n_par:n_par + nc]
    acc_a = scratch[n_par + nc:n_par + nc + na]
    closs_s, aloss_s = scratch[n_par + nc + na:]

    kk = pl.program_id(0)
    ph = pl.program_id(1)
    j = pl.program_id(2)

    # group slices of the VMEM-resident working set
    o = [0, na, na + nc, 2 * na + nc, 2 * (na + nc), 3 * na + 2 * nc,
         4 * na + 2 * nc, 4 * na + 3 * nc, n_par]
    (a_s, c_s, at_s, ct_s, ma_s, va_s, mc_s, vc_s) = (
        par_s[o[i]:o[i + 1]] for i in range(8))

    @pl.when((kk == 0) & (ph == 0) & (j == 0))
    def _init():
        for dst, src in zip(par_s, par_in):
            dst[:] = src[:]

    obs = obs_ref[0]
    act = act_ref[0]

    def accumulate(acc, grads, loss_acc, tile):
        @pl.when(j == 0)
        def _first():
            for dst, g in zip(acc, grads):
                dst[:] = g
            loss_acc[:] = tile

        @pl.when(j > 0)
        def _rest():
            for dst, g in zip(acc, grads):
                dst[:] = dst[:] + g
            loss_acc[:] = loss_acc[:] + tile

    def apply_adam(params, ms, vs, acc, lr):
        tk = (t0_ref[0, 0] + kk + 1).astype(jnp.float32)
        lr = _sched_lr(lr, lr_schedule, tk)
        for p, m, v, g in zip(params, ms, vs, acc):
            pn, mn, vn = adam_step(p[:], m[:], v[:], g[:], tk, lr)
            p[:] = pn
            m[:] = mn
            v[:] = vn

    def polyak_and_losses():
        for tr, on in zip(at_s, a_s):
            tr[:] = tr[:] + np.float32(tau) * (on[:] - tr[:])
        for tr, on in zip(ct_s, c_s):
            tr[:] = tr[:] + np.float32(tau) * (on[:] - tr[:])
        losses_ref[0] = jnp.concatenate(
            [closs_s[:], aloss_s[:],
             jnp.zeros((6, 128), jnp.float32)], axis=0)

    if merged:
        # actor_grad_critic="pre": both gradients from the SAME critic
        # per block — one phase per update, obs/nobs read once, half
        # the grid steps.
        cgrads, closs = critic_phase_block(
            [r[:] for r in at_s], [r[:] for r in c_s],
            [r[:] for r in ct_s], obs, nobs_ref[0], act, rew_ref[0],
            done_ref[0], gamma, inv_bm, hidden)
        agrads, aloss = actor_phase_block(
            [r[:] for r in a_s], [r[:] for r in c_s], obs, inv_bm,
            hidden)
        accumulate(acc_c, cgrads, closs_s,
                   jnp.full((1, 128), closs, jnp.float32))
        accumulate(acc_a, agrads, aloss_s,
                   jnp.full((1, 128), aloss, jnp.float32))

        @pl.when(j == nb - 1)
        def _apply_merged():
            apply_adam(c_s, mc_s, vc_s, acc_c, critic_lr)
            apply_adam(a_s, ma_s, va_s, acc_a, actor_lr)
            polyak_and_losses()
    else:
        @pl.when(ph == 0)
        def _critic_phase():
            grads, closs = critic_phase_block(
                [r[:] for r in at_s], [r[:] for r in c_s],
                [r[:] for r in ct_s], obs, nobs_ref[0], act, rew_ref[0],
                done_ref[0], gamma, inv_bm, hidden)
            accumulate(acc_c, grads, closs_s,
                       jnp.full((1, 128), closs, jnp.float32))

            @pl.when(j == nb - 1)
            def _apply():
                apply_adam(c_s, mc_s, vc_s, acc_c, critic_lr)

        @pl.when(ph == 1)
        def _actor_phase():
            grads, aloss = actor_phase_block(
                [r[:] for r in a_s], [r[:] for r in c_s], obs, inv_bm,
                hidden)
            accumulate(acc_a, grads, aloss_s,
                       jnp.full((1, 128), aloss, jnp.float32))

            @pl.when(j == nb - 1)
            def _apply():
                apply_adam(a_s, ma_s, va_s, acc_a, actor_lr)
                polyak_and_losses()

    last_ph = 0 if merged else 1

    @pl.when((kk == k_updates - 1) & (ph == last_ph) & (j == nb - 1))
    def _finalize():
        for dst, src in zip(outs, par_s):
            dst[:] = src[:]


def ddpg_update_phase(hidden, obs_dim: int, k_updates: int,
                      batch_size: int, *, actor_lr: float,
                      critic_lr: float, gamma: float, tau: float,
                      block_size: int = 512, interpret: bool = False,
                      mm_precision: str | None = None,
                      actor_grad_critic: str = "updated",
                      lr_schedule=None):
    """Builder: one pallas_call covering the whole K-update DDPG learner
    phase.

    Returned fn(groups, batches, t0) -> (groups', closs (K,), aloss (K,))
    with groups = (actor, critic, actor_t, critic_t, m_a, v_a, m_c, v_c)
    as flat operand lists (flatten_actor / flatten_critic layout),
    batches = the replay_presample output (obs (K, Bm, F), action
    (K, Bm, 2), reward (K, Bm), next_obs (K, Bm, F), done (K, Bm)), and
    t0 the optax Adam step count before this phase.
    """
    hidden = tuple(hidden)
    if len(hidden) < 2:
        raise ValueError("the fused update kernel needs >= 2 hidden "
                         "layers (action injects at layer 1)")
    a_sh = actor_shapes(hidden, obs_dim)
    c_sh = critic_shapes(hidden, obs_dim)
    group_shapes = ([a_sh, c_sh, a_sh, c_sh]      # params + targets
                    + [a_sh, a_sh, c_sh, c_sh])   # m_a, v_a, m_c, v_c
    na, nc = len(a_sh), len(c_sh)
    blk = min(block_size, batch_size)
    if batch_size % blk:
        raise ValueError(f"batch_size {batch_size} not divisible by "
                         f"block {blk}")
    nb = batch_size // blk

    merged = actor_grad_critic == "pre"
    kernel = functools.partial(_update_kernel, hidden, na, nc, nb,
                               gamma, tau, actor_lr, critic_lr,
                               lr_schedule,
                               1.0 / batch_size, k_updates, merged)

    def batch_spec(width):
        return pl.BlockSpec((1, blk, width), lambda k, ph, j: (k, j, 0),
                            memory_space=pltpu.VMEM)

    def par_spec(shape):
        return pl.BlockSpec(shape, lambda k, ph, j: (0, 0),
                            memory_space=pltpu.VMEM)

    flat_shapes = [s for g in group_shapes for s in g]
    in_specs = (
        [batch_spec(obs_dim), batch_spec(obs_dim), batch_spec(2),
         batch_spec(1), batch_spec(1)]
        + [par_spec(s) for s in flat_shapes]
        + [pl.BlockSpec((1, 1), lambda k, ph, j: (0, 0),
                        memory_space=pltpu.SMEM)]
    )
    out_shape = ([jax.ShapeDtypeStruct(s, jnp.float32)
                  for s in flat_shapes]
                 + [jax.ShapeDtypeStruct((k_updates, 8, 128),
                                         jnp.float32)])
    out_specs = ([par_spec(s) for s in flat_shapes]
                 + [pl.BlockSpec((1, 8, 128), lambda k, ph, j: (k, 0, 0),
                                 memory_space=pltpu.VMEM)])
    scratch_shapes = (
        [pltpu.VMEM(s, jnp.float32) for s in flat_shapes]     # working
        + [pltpu.VMEM(s, jnp.float32) for s in c_sh]          # acc_c
        + [pltpu.VMEM(s, jnp.float32) for s in a_sh]          # acc_a
        + [pltpu.VMEM((1, 128), jnp.float32)] * 2             # losses
    )
    call = pl.pallas_call(
        kernel,
        grid=(k_updates, 1 if merged else 2, nb),
        in_specs=in_specs,
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )
    sizes = [len(g) for g in group_shapes]

    def run(groups, batches, t0):
        obs, act, rew, nobs, done = batches
        k, bm = obs.shape[0], obs.shape[1]
        args = ([obs, nobs, act, rew.reshape(k, bm, 1),
                 done.astype(jnp.float32).reshape(k, bm, 1)]
                + [arr for g in groups for arr in g]
                + [jnp.asarray(t0, jnp.int32).reshape(1, 1)])
        out = _with_mm_precision(call, mm_precision, args)
        new_groups, pos = [], 0
        for sz in sizes:
            new_groups.append(list(out[pos:pos + sz]))
            pos += sz
        losses = out[pos]
        return tuple(new_groups), losses[:, 0, 0], losses[:, 1, 0]

    return run


# --------------------------------------------------------------------------
# DQN: the same fused-update-phase treatment for the Q-learner.
#
# Reference counterpart: keras-rl DQNAgent's per-step TD update
# (SURVEY.md §3.4; reference mount empty this session). Semantics here
# are exactly agents/dqn.py::upd_body with presampled batches: per
# update k — (double-)DQN Huber TD step (Adam) + Polyak target — K
# times sequentially, as ONE kernel over grid (K, NB). QNetMLP has the
# identical tree structure to ActorMLP, so the flatten_actor layout and
# mlp_fwd/mlp_bwd apply verbatim; the discrete action gather/argmax
# become lane-mask algebra (head pad lanes are exactly zero, so argmax
# masks them to -inf; one-hots come from lane iota comparisons with
# jnp.argmax's first-max tie-break reproduced via a min-index reduce).
# --------------------------------------------------------------------------

_HUBER_DELTA = 1.0   # optax.huber_loss default


def dqn_phase_block(q, q_target, obs, nobs, act, rew, done, gamma: float,
                    inv_batch: float, hidden, num_actions: int,
                    double_dqn: bool):
    """TD gradient contribution of one batch block. act is (B, 1) i32,
    rew/done (B, 1) f32. Returns (flat grads, loss contribution)."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, (rew.shape[0], 8), 1)
    valid = lanes < num_actions
    qt8, _ = mlp_fwd(nobs, q_target, hidden)
    sel = mlp_fwd(nobs, q, hidden)[0] if double_dqn else qt8
    selm = jnp.where(valid, sel, np.float32(-3.4e38))
    amax = jnp.max(selm, axis=1, keepdims=True)
    first = jnp.min(jnp.where(selm >= amax, lanes, 99), axis=1,
                    keepdims=True)
    q_next = jnp.sum(qt8 * (lanes == first).astype(jnp.float32), axis=1,
                     keepdims=True)
    y = rew + np.float32(gamma) * (1.0 - done) * q_next
    q8, res = mlp_fwd(obs, q, hidden)
    onehot_a = (lanes == act).astype(jnp.float32)
    q_sa = jnp.sum(q8 * onehot_a, axis=1, keepdims=True)
    td = q_sa - y
    d = np.float32(_HUBER_DELTA)
    dq8 = (jnp.clip(td, -d, d) * np.float32(inv_batch)) * onehot_a
    grads = mlp_bwd(dq8, q, hidden, res)
    abs_td = jnp.abs(td)
    hub = jnp.where(abs_td <= d, 0.5 * td * td,
                    d * (abs_td - 0.5 * d))
    return grads, np.float32(inv_batch) * jnp.sum(hub)


def dqn_update_phase_math(q, q_target, m, v, batches, t0, hidden, *,
                          lr, gamma, tau, num_actions: int = 5,
                          double_dqn: bool = True, num_blocks: int = 1):
    """K sequential DQN updates on flat operand lists — the kernel's
    componentwise jnp twin. batches: (obs (K, Bm, F), action (K, Bm)
    i32, reward (K, Bm), next_obs (K, Bm, F), done (K, Bm)). Returns
    (q, q_target, m, v, loss (K,))."""
    k_updates, bm = batches[0].shape[0], batches[0].shape[1]
    blk = bm // num_blocks
    inv = 1.0 / bm
    losses = []
    for k in range(k_updates):
        obs, act, rew, nobs, done = (x[k] for x in batches)
        act = act.astype(jnp.int32)[:, None]
        rew = rew[:, None]
        done = done.astype(jnp.float32)[:, None]
        tk = (t0 + k + 1).astype(jnp.float32)
        g_acc, loss = None, jnp.float32(0.0)
        for j in range(num_blocks):
            sl = slice(j * blk, (j + 1) * blk)
            g, ls = dqn_phase_block(q, q_target, obs[sl], nobs[sl],
                                    act[sl], rew[sl], done[sl], gamma,
                                    inv, hidden, num_actions, double_dqn)
            g_acc = g if g_acc is None else [a + b
                                             for a, b in zip(g_acc, g)]
            loss = loss + ls
        new = [adam_step(p, mm, vv, g, tk, lr)
               for p, mm, vv, g in zip(q, m, v, g_acc)]
        q, m, v = ([x[i] for x in new] for i in range(3))
        q_target = polyak_flat(q_target, q, tau)
        losses.append(loss)
    return q, q_target, m, v, jnp.stack(losses)


def _dqn_update_kernel(hidden, na: int, nb: int, gamma: float,
                       tau: float, lr: float, inv_bm: float,
                       k_updates: int, num_actions: int,
                       double_dqn: bool, *refs):
    n_par = 4 * na
    obs_ref, nobs_ref, act_ref, rew_ref, done_ref = refs[:5]
    par_in = refs[5:5 + n_par]
    t0_ref = refs[5 + n_par]
    outs = refs[6 + n_par:6 + 2 * n_par]
    losses_ref = refs[6 + 2 * n_par]
    scratch = refs[7 + 2 * n_par:]
    par_s = scratch[:n_par]
    acc = scratch[n_par:n_par + na]
    loss_s = scratch[n_par + na]

    kk = pl.program_id(0)
    j = pl.program_id(1)
    q_s, qt_s, m_s, v_s = (par_s[i * na:(i + 1) * na] for i in range(4))

    @pl.when((kk == 0) & (j == 0))
    def _init():
        for dst, src in zip(par_s, par_in):
            dst[:] = src[:]

    grads, loss = dqn_phase_block(
        [r[:] for r in q_s], [r[:] for r in qt_s], obs_ref[0],
        nobs_ref[0], act_ref[0], rew_ref[0], done_ref[0], gamma,
        inv_bm, hidden, num_actions, double_dqn)
    tile = jnp.full((1, 128), loss, jnp.float32)

    @pl.when(j == 0)
    def _first():
        for dst, g in zip(acc, grads):
            dst[:] = g
        loss_s[:] = tile

    @pl.when(j > 0)
    def _rest():
        for dst, g in zip(acc, grads):
            dst[:] = dst[:] + g
        loss_s[:] = loss_s[:] + tile

    @pl.when(j == nb - 1)
    def _apply():
        tk = (t0_ref[0, 0] + kk + 1).astype(jnp.float32)
        for p, m, v, g in zip(q_s, m_s, v_s, acc):
            pn, mn, vn = adam_step(p[:], m[:], v[:], g[:], tk, lr)
            p[:] = pn
            m[:] = mn
            v[:] = vn
        for tr, on in zip(qt_s, q_s):
            tr[:] = tr[:] + np.float32(tau) * (on[:] - tr[:])
        losses_ref[0] = jnp.concatenate(
            [loss_s[:], jnp.zeros((7, 128), jnp.float32)], axis=0)

    @pl.when((kk == k_updates - 1) & (j == nb - 1))
    def _finalize():
        for dst, src in zip(outs, par_s):
            dst[:] = src[:]


def dqn_update_phase(hidden, obs_dim: int, k_updates: int,
                     batch_size: int, *, lr: float, gamma: float,
                     tau: float, num_actions: int = 5,
                     double_dqn: bool = True, block_size: int = 512,
                     interpret: bool = False,
                     mm_precision: str | None = None):
    """Builder: one pallas_call covering the whole K-update DQN learner
    phase. Returned fn(groups, batches, t0) -> (groups', loss (K,))
    with groups = (q, q_target, m, v) flat operand lists (flatten_actor
    layout — QNetMLP shares ActorMLP's tree structure) and batches the
    replay_presample output with int32 actions."""
    hidden = tuple(hidden)
    a_sh = actor_shapes(hidden, obs_dim)
    na = len(a_sh)
    blk = min(block_size, batch_size)
    if batch_size % blk:
        raise ValueError(f"batch_size {batch_size} not divisible by "
                         f"block {blk}")
    nb = batch_size // blk

    kernel = functools.partial(_dqn_update_kernel, hidden, na, nb,
                               gamma, tau, lr, 1.0 / batch_size,
                               k_updates, num_actions, double_dqn)

    def batch_spec(width):
        return pl.BlockSpec((1, blk, width), lambda k, j: (k, j, 0),
                            memory_space=pltpu.VMEM)

    def par_spec(shape):
        return pl.BlockSpec(shape, lambda k, j: (0, 0),
                            memory_space=pltpu.VMEM)

    flat_shapes = a_sh * 4
    in_specs = (
        [batch_spec(obs_dim), batch_spec(obs_dim), batch_spec(1),
         batch_spec(1), batch_spec(1)]
        + [par_spec(s) for s in flat_shapes]
        + [pl.BlockSpec((1, 1), lambda k, j: (0, 0),
                        memory_space=pltpu.SMEM)]
    )
    out_shape = ([jax.ShapeDtypeStruct(s, jnp.float32)
                  for s in flat_shapes]
                 + [jax.ShapeDtypeStruct((k_updates, 8, 128),
                                         jnp.float32)])
    out_specs = ([par_spec(s) for s in flat_shapes]
                 + [pl.BlockSpec((1, 8, 128), lambda k, j: (k, 0, 0),
                                 memory_space=pltpu.VMEM)])
    scratch_shapes = (
        [pltpu.VMEM(s, jnp.float32) for s in flat_shapes]
        + [pltpu.VMEM(s, jnp.float32) for s in a_sh]
        + [pltpu.VMEM((1, 128), jnp.float32)]
    )
    call = pl.pallas_call(
        kernel,
        grid=(k_updates, nb),
        in_specs=in_specs,
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )

    def run(groups, batches, t0):
        obs, act, rew, nobs, done = batches
        k, bm = obs.shape[0], obs.shape[1]
        args = ([obs, nobs,
                 act.astype(jnp.int32).reshape(k, bm, 1),
                 rew.reshape(k, bm, 1),
                 done.astype(jnp.float32).reshape(k, bm, 1)]
                + [arr for g in groups for arr in g]
                + [jnp.asarray(t0, jnp.int32).reshape(1, 1)])
        out = _with_mm_precision(call, mm_precision, args)
        new_groups = tuple(list(out[i * na:(i + 1) * na])
                           for i in range(4))
        return new_groups, out[4 * na][:, 0, 0]

    return run


# --------------------------------------------------------------------------
# NAF: fused update phase for the quadratic-advantage Q-learner.
#
# Reference counterpart: `naf_cartpole.py`'s TF training step (SURVEY.md
# §2a; reference mount empty this session). Semantics are exactly
# agents/naf.py::upd_body: per update k — MSE TD step toward
# y = r + gamma (1-d) V_target(s'), optional optax clip_by_global_norm,
# Adam, Polyak — K times as ONE kernel over grid (K, NB).
#
# NafNet is a torso with THREE linear heads (V (H,1), mu (H,2),
# L-entries (H,3)); they pack into one transposed (8, H) head, rows
# [v, mu0, mu1, l0, l1, l2, 0, 0], so the shared mlp_fwd/mlp_bwd cover
# the whole network. The 2x2 Cholesky advantage
#   A = -1/2 |L^T (a - mu)|^2,  L = [[sp(l0), 0], [l1, sp(l2)]]
# and its backward are per-sample lane algebra; lane extraction uses
# iota one-hot reduces (no lane slicing).
# --------------------------------------------------------------------------

def _softplus(x):
    """jax.nn.softplus's stable form (max(x,0) + log1p(exp(-|x|)))."""
    return jnp.maximum(x, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(x)))


def _sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))


def _lane(pre, i: int):
    """Extract lane i of (B, 8) as a (B, 1) column via a one-hot reduce."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, pre.shape, 1)
    return jnp.sum(pre * (lanes == i).astype(jnp.float32), axis=1,
                   keepdims=True)


def _from_lanes(cols):
    """Assemble (B, 8) from a list of (B, 1) columns (rest zero)."""
    b = cols[0].shape[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (b, 8), 1)
    out = jnp.zeros((b, 8), jnp.float32)
    for i, c in enumerate(cols):
        out = out + c * (lanes == i).astype(jnp.float32)
    return out


def naf_q(pre, act):
    """Q, and the residue for naf backward, from the packed head
    pre-activations (B, 8) and actions (B, 2)."""
    v = _lane(pre, 0)
    mu0, mu1 = _lane(pre, 1), _lane(pre, 2)
    l0, l1, l2 = _lane(pre, 3), _lane(pre, 4), _lane(pre, 5)
    # Lane-slice-free action extraction (Mosaic rejects narrow lane
    # slices at nonzero offsets): one-hot reduces over the (B, 2) tile.
    lanes2 = jax.lax.broadcasted_iota(jnp.int32, act.shape, 1)
    a0 = jnp.sum(act * (lanes2 == 0).astype(jnp.float32), axis=1,
                 keepdims=True)
    a1 = jnp.sum(act * (lanes2 == 1).astype(jnp.float32), axis=1,
                 keepdims=True)
    da0, da1 = a0 - mu0, a1 - mu1
    l00, l11 = _softplus(l0), _softplus(l2)
    u0 = l00 * da0 + l1 * da1
    u1 = l11 * da1
    q = v - 0.5 * (u0 * u0 + u1 * u1)
    return q, (da0, da1, l00, l11, l0, l1, l2, u0, u1)


def naf_q_bwd(dq, residue):
    """d(pre-activations) (B, 8) for upstream dq (B, 1)."""
    da0, da1, l00, l11, l0, l1, l2, u0, u1 = residue
    dv = dq
    du0 = -dq * u0
    du1 = -dq * u1
    dl00 = du0 * da0
    dl10 = du0 * da1
    dl11 = du1 * da1
    dda0 = du0 * l00
    dda1 = du0 * l1 + du1 * l11
    dmu0, dmu1 = -dda0, -dda1
    dl0 = dl00 * _sigmoid(l0)
    dl2 = dl11 * _sigmoid(l2)
    return _from_lanes([dv, dmu0, dmu1, dl0, dl10, dl2])


def naf_phase_block(params, target, obs, nobs, act, rew, done,
                    gamma: float, inv_batch: float, hidden):
    """TD gradient contribution of one batch block. act (B, 2),
    rew/done (B, 1). Returns (flat grads, loss contribution)."""
    pre_t, _ = mlp_fwd(nobs, target, hidden)
    v_next = _lane(pre_t, 0)
    y = rew + np.float32(gamma) * (1.0 - done) * v_next
    pre, res = mlp_fwd(obs, params, hidden)
    q, qres = naf_q(pre, act)
    td = q - y
    dpre = naf_q_bwd(np.float32(2.0 * inv_batch) * td, qres)
    grads = mlp_bwd(dpre, params, hidden, res)
    return grads, np.float32(inv_batch) * jnp.sum(td * td)


def clip_by_global_norm_flat(grads, max_norm: float):
    """optax.clip_by_global_norm on a flat operand list."""
    gsq = jnp.float32(0.0)
    for g in grads:
        gsq = gsq + jnp.sum(g * g)
    gn = jnp.sqrt(gsq)
    scale = jnp.where(gn < np.float32(max_norm), 1.0,
                      np.float32(max_norm) / gn)
    return [g * scale for g in grads]


def naf_update_phase_math(params, target, m, v, batches, t0, hidden, *,
                          lr, gamma, tau, max_grad_norm: float = 0.0,
                          num_blocks: int = 1, lr_schedule=None):
    """K sequential NAF updates on flat operand lists — the kernel's
    componentwise jnp twin. Returns (params, target, m, v, loss (K,))."""
    k_updates, bm = batches[0].shape[0], batches[0].shape[1]
    blk = bm // num_blocks
    inv = 1.0 / bm
    losses = []
    for k in range(k_updates):
        obs, act, rew, nobs, done = (x[k] for x in batches)
        rew = rew[:, None]
        done = done.astype(jnp.float32)[:, None]
        tk = (t0 + k + 1).astype(jnp.float32)
        g_acc, loss = None, jnp.float32(0.0)
        for j in range(num_blocks):
            sl = slice(j * blk, (j + 1) * blk)
            g, ls = naf_phase_block(params, target, obs[sl], nobs[sl],
                                    act[sl], rew[sl], done[sl], gamma,
                                    inv, hidden)
            g_acc = g if g_acc is None else [a + b
                                             for a, b in zip(g_acc, g)]
            loss = loss + ls
        if max_grad_norm > 0.0:
            g_acc = clip_by_global_norm_flat(g_acc, max_grad_norm)
        lr_k = _sched_lr(lr, lr_schedule, tk)
        new = [adam_step(p, mm, vv, g, tk, lr_k)
               for p, mm, vv, g in zip(params, m, v, g_acc)]
        params, m, v = ([x[i] for x in new] for i in range(3))
        target = polyak_flat(target, params, tau)
        losses.append(loss)
    return params, target, m, v, jnp.stack(losses)


def _naf_update_kernel(hidden, na: int, nb: int, gamma: float,
                       tau: float, lr: float, inv_bm: float,
                       k_updates: int, max_grad_norm: float,
                       lr_schedule, *refs):
    n_par = 4 * na
    obs_ref, nobs_ref, act_ref, rew_ref, done_ref = refs[:5]
    par_in = refs[5:5 + n_par]
    t0_ref = refs[5 + n_par]
    outs = refs[6 + n_par:6 + 2 * n_par]
    losses_ref = refs[6 + 2 * n_par]
    scratch = refs[7 + 2 * n_par:]
    par_s = scratch[:n_par]
    acc = scratch[n_par:n_par + na]
    loss_s = scratch[n_par + na]

    kk = pl.program_id(0)
    j = pl.program_id(1)
    p_s, t_s, m_s, v_s = (par_s[i * na:(i + 1) * na] for i in range(4))

    @pl.when((kk == 0) & (j == 0))
    def _init():
        for dst, src in zip(par_s, par_in):
            dst[:] = src[:]

    grads, loss = naf_phase_block(
        [r[:] for r in p_s], [r[:] for r in t_s], obs_ref[0],
        nobs_ref[0], act_ref[0], rew_ref[0], done_ref[0], gamma,
        inv_bm, hidden)
    tile = jnp.full((1, 128), loss, jnp.float32)

    @pl.when(j == 0)
    def _first():
        for dst, g in zip(acc, grads):
            dst[:] = g
        loss_s[:] = tile

    @pl.when(j > 0)
    def _rest():
        for dst, g in zip(acc, grads):
            dst[:] = dst[:] + g
        loss_s[:] = loss_s[:] + tile

    @pl.when(j == nb - 1)
    def _apply():
        tk = (t0_ref[0, 0] + kk + 1).astype(jnp.float32)
        lr_k = _sched_lr(lr, lr_schedule, tk)
        g_list = [g[:] for g in acc]
        if max_grad_norm > 0.0:
            g_list = clip_by_global_norm_flat(g_list, max_grad_norm)
        for p, m, v, g in zip(p_s, m_s, v_s, g_list):
            pn, mn, vn = adam_step(p[:], m[:], v[:], g, tk, lr_k)
            p[:] = pn
            m[:] = mn
            v[:] = vn
        for tr, on in zip(t_s, p_s):
            tr[:] = tr[:] + np.float32(tau) * (on[:] - tr[:])
        losses_ref[0] = jnp.concatenate(
            [loss_s[:], jnp.zeros((7, 128), jnp.float32)], axis=0)

    @pl.when((kk == k_updates - 1) & (j == nb - 1))
    def _finalize():
        for dst, src in zip(outs, par_s):
            dst[:] = src[:]


def naf_update_phase(hidden, obs_dim: int, k_updates: int,
                     batch_size: int, *, lr: float, gamma: float,
                     tau: float, max_grad_norm: float = 0.0,
                     block_size: int = 512, interpret: bool = False,
                     mm_precision: str | None = None,
                     lr_schedule=None):
    """Builder: one pallas_call covering the whole K-update NAF learner
    phase. Returned fn(groups, batches, t0) -> (groups', loss (K,))
    with groups = (params, target, m, v) as flatten_naf operand lists."""
    hidden = tuple(hidden)
    a_sh = actor_shapes(hidden, obs_dim)
    na = len(a_sh)
    blk = min(block_size, batch_size)
    if batch_size % blk:
        raise ValueError(f"batch_size {batch_size} not divisible by "
                         f"block {blk}")
    nb = batch_size // blk

    kernel = functools.partial(_naf_update_kernel, hidden, na, nb,
                               gamma, tau, lr, 1.0 / batch_size,
                               k_updates, max_grad_norm, lr_schedule)

    def batch_spec(width):
        return pl.BlockSpec((1, blk, width), lambda k, j: (k, j, 0),
                            memory_space=pltpu.VMEM)

    def par_spec(shape):
        return pl.BlockSpec(shape, lambda k, j: (0, 0),
                            memory_space=pltpu.VMEM)

    flat_shapes = a_sh * 4
    in_specs = (
        [batch_spec(obs_dim), batch_spec(obs_dim), batch_spec(2),
         batch_spec(1), batch_spec(1)]
        + [par_spec(s) for s in flat_shapes]
        + [pl.BlockSpec((1, 1), lambda k, j: (0, 0),
                        memory_space=pltpu.SMEM)]
    )
    out_shape = ([jax.ShapeDtypeStruct(s, jnp.float32)
                  for s in flat_shapes]
                 + [jax.ShapeDtypeStruct((k_updates, 8, 128),
                                         jnp.float32)])
    out_specs = ([par_spec(s) for s in flat_shapes]
                 + [pl.BlockSpec((1, 8, 128), lambda k, j: (k, 0, 0),
                                 memory_space=pltpu.VMEM)])
    scratch_shapes = (
        [pltpu.VMEM(s, jnp.float32) for s in flat_shapes]
        + [pltpu.VMEM(s, jnp.float32) for s in a_sh]
        + [pltpu.VMEM((1, 128), jnp.float32)]
    )
    call = pl.pallas_call(
        kernel,
        grid=(k_updates, nb),
        in_specs=in_specs,
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )

    def run(groups, batches, t0):
        obs, act, rew, nobs, done = batches
        k, bm = obs.shape[0], obs.shape[1]
        args = ([obs, nobs, act, rew.reshape(k, bm, 1),
                 done.astype(jnp.float32).reshape(k, bm, 1)]
                + [arr for g in groups for arr in g]
                + [jnp.asarray(t0, jnp.int32).reshape(1, 1)])
        out = _with_mm_precision(call, mm_precision, args)
        new_groups = tuple(list(out[i * na:(i + 1) * na])
                           for i in range(4))
        return new_groups, out[4 * na][:, 0, 0]

    return run


def flatten_naf(params, hidden):
    """NafNet tree (or same-structure Adam moments) -> flat operand
    list. The V (Dense_0), mu (Dense_1) and L-entry (Dense_2) heads
    pack into one (8, H) transposed head + (1, 8) bias, rows
    [v, mu0, mu1, l0, l1, l2, 0, 0]."""
    torso = params["params"]["_Torso_0"]
    wm = max(hidden)
    ws, vecs = [], []
    for i, _ in enumerate(hidden):
        d, ln = torso[f"Dense_{i}"], torso[f"LayerNorm_{i}"]
        ws.append(jnp.asarray(d["kernel"], jnp.float32))
        vecs += [d["bias"], ln["scale"], ln["bias"]]
    heads = [params["params"][f"Dense_{i}"] for i in range(3)]
    wt = jnp.concatenate([jnp.transpose(h["kernel"]) for h in heads],
                         axis=0)                       # (6, H)
    wh = jnp.concatenate(
        [wt, jnp.zeros((2, wt.shape[1]), jnp.float32)], axis=0)
    bh = jnp.concatenate([h["bias"] for h in heads] +
                         [jnp.zeros((2,), jnp.float32)])[None, :]
    return ws + [wh, _pack_rows(vecs, len(hidden), wm), bh]


def unflatten_naf(flat, hidden):
    ws, wh, rows, bh = flat[:-3], flat[-3], flat[-2], flat[-1]
    torso = {}
    for i, hd in enumerate(hidden):
        torso[f"Dense_{i}"] = {"kernel": ws[i], "bias": rows[3 * i, :hd]}
        torso[f"LayerNorm_{i}"] = {"scale": rows[3 * i + 1, :hd],
                                   "bias": rows[3 * i + 2, :hd]}
    p = {"_Torso_0": torso}
    for i, (lo, hi) in enumerate([(0, 1), (1, 3), (3, 6)]):
        p[f"Dense_{i}"] = {"kernel": jnp.transpose(wh[lo:hi]),
                           "bias": bh[0, lo:hi]}
    return {"params": p}


# --------------------------------------------------------------------------
# LRPG: fused update phase for the on-policy softmax policy gradient.
#
# Reference counterpart: the per-episode likelihood-ratio update of
# `lrpg_cartpole.py` (SURVEY.md §2a/§3.2; reference mount empty this
# session). Semantics here are exactly agents/lrpg.py::_loss under
# jax.grad + one optax.adam step, on the (T*B)-row rollout window with
# precomputed advantages: loss = -mean(logp[a] * adv)
# - entropy_coef * mean(H), H = -sum_i p_i logp_i. The softmax gradient
# is closed-form, so no autodiff is needed inside the kernel:
#   dlogits = (adv * (p - onehot_a) + coef * p * (logp + H)) / N.
# Pad lanes (num_actions..7) carry exactly-zero probability and
# gradient: the head pad rows are zero, the lane mask sends their
# logits to -inf for the softmax (p = 0) and zeroes their logp term,
# so p - onehot = 0 and p*(logp + H) = 0 there — the invariant that
# keeps the padded head rows zero through training.
#
# Unlike the replay agents there is ONE update per train step, so the
# grid is just (NB,) batch blocks: gradients accumulate in VMEM
# scratch across blocks and a single Adam step applies at the last.
# PolicyMLP shares ActorMLP/QNetMLP's tree structure, so the
# flatten_actor layout and mlp_fwd/mlp_bwd apply verbatim.
#
# The numerical twin is `lrpg_update_phase_math` below, pinned against
# agents/lrpg.py's jax.grad + optax path AND this kernel in interpret
# mode by tests/test_learner_kernel.py.
# --------------------------------------------------------------------------

def lrpg_phase_block(params, obs, act, adv, hidden, num_actions: int,
                     entropy_coef: float, inv_n: float):
    """Policy-gradient contribution of one (B, F) row block. act is
    (B, 1) i32, adv (B, 1) f32 (already window-normalized). Returns
    (flat grads, loss contribution)."""
    logits8, res = mlp_fwd(obs, params, hidden)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (obs.shape[0], 8), 1)
    valid = lanes < num_actions
    zm = jnp.max(jnp.where(valid, logits8, np.float32(-3.4e38)),
                 axis=1, keepdims=True)
    ex = jnp.where(valid, jnp.exp(logits8 - zm), 0.0)
    z = jnp.sum(ex, axis=1, keepdims=True)
    p = ex / z
    logp = jnp.where(valid, logits8 - zm - jnp.log(z), 0.0)
    onehot = (lanes == act).astype(jnp.float32)
    lp_a = jnp.sum(logp * onehot, axis=1, keepdims=True)
    ent = -jnp.sum(p * logp, axis=1, keepdims=True)
    coef, inv = np.float32(entropy_coef), np.float32(inv_n)
    dlogits = inv * (adv * (p - onehot) + coef * p * (logp + ent))
    grads = mlp_bwd(dlogits, params, hidden, res)
    loss = inv * jnp.sum(-lp_a * adv - coef * ent)
    return grads, loss


def lrpg_update_phase_math(params, m, v, window, t0, hidden, *, lr,
                           entropy_coef, num_actions: int = 5,
                           num_blocks: int = 1):
    """One LRPG Adam update on flat operand lists — the kernel's
    componentwise jnp twin. window: (obs (N, F), action (N,) i32,
    advantage (N,) f32) with N = rollout_steps * num_envs flattened.
    Returns (params, m, v, loss ())."""
    n = window[0].shape[0]
    blk = n // num_blocks
    inv = 1.0 / n
    obs, act, adv = window
    act = act.astype(jnp.int32)[:, None]
    adv = adv[:, None]
    g_acc, loss = None, jnp.float32(0.0)
    for j in range(num_blocks):
        sl = slice(j * blk, (j + 1) * blk)
        g, ls = lrpg_phase_block(params, obs[sl], act[sl], adv[sl],
                                 hidden, num_actions, entropy_coef, inv)
        g_acc = g if g_acc is None else [a + b for a, b in zip(g_acc, g)]
        loss = loss + ls
    tk = (t0 + 1).astype(jnp.float32)
    new = [adam_step(p, mm, vv, g, tk, lr)
           for p, mm, vv, g in zip(params, m, v, g_acc)]
    params, m, v = ([x[i] for x in new] for i in range(3))
    return params, m, v, loss


def _lrpg_update_kernel(hidden, na: int, nb: int, lr: float,
                        entropy_coef: float, inv_n: float,
                        num_actions: int, *refs):
    obs_ref, act_ref, adv_ref = refs[:3]
    par_in = refs[3:3 + 3 * na]
    t0_ref = refs[3 + 3 * na]
    outs = refs[4 + 3 * na:4 + 6 * na]
    loss_ref = refs[4 + 6 * na]
    scratch = refs[5 + 6 * na:]
    acc = scratch[:na]
    loss_s = scratch[na]

    j = pl.program_id(0)
    p_in = par_in[:na]
    m_in = par_in[na:2 * na]
    v_in = par_in[2 * na:3 * na]

    # Params are read-only until the single Adam apply at the last
    # block, so the phase block reads the input refs directly — no
    # VMEM working copy (unlike the K-update kernels).
    grads, loss = lrpg_phase_block(
        [r[:] for r in p_in], obs_ref[:], act_ref[:], adv_ref[:],
        hidden, num_actions, entropy_coef, inv_n)
    tile = jnp.full((1, 128), loss, jnp.float32)

    @pl.when(j == 0)
    def _first():
        for dst, g in zip(acc, grads):
            dst[:] = g
        loss_s[:] = tile

    @pl.when(j > 0)
    def _rest():
        for dst, g in zip(acc, grads):
            dst[:] = dst[:] + g
        loss_s[:] = loss_s[:] + tile

    @pl.when(j == nb - 1)
    def _apply():
        tk = (t0_ref[0, 0] + 1).astype(jnp.float32)
        for po, mo, vo, p, m, v, g in zip(outs[:na], outs[na:2 * na],
                                          outs[2 * na:3 * na], p_in,
                                          m_in, v_in, acc):
            pn, mn, vn = adam_step(p[:], m[:], v[:], g[:], tk, lr)
            po[:] = pn
            mo[:] = mn
            vo[:] = vn
        loss_ref[:] = jnp.concatenate(
            [loss_s[:], jnp.zeros((7, 128), jnp.float32)], axis=0)


def lrpg_update_phase(hidden, obs_dim: int, n_rows: int, *, lr: float,
                      entropy_coef: float, num_actions: int = 5,
                      block_size: int = 1024, interpret: bool = False,
                      mm_precision: str | None = None):
    """Builder: the LRPG update (one Adam step on the whole rollout
    window) as one pallas_call. Returned fn(groups, window, t0) ->
    (groups', loss ()) with groups = (params, m, v) flat operand lists
    (flatten_actor layout — PolicyMLP shares ActorMLP's tree
    structure), window = (obs (N, F), action (N,) i32, advantage (N,)
    f32), and t0 the optax Adam step count before this update."""
    hidden = tuple(hidden)
    a_sh = actor_shapes(hidden, obs_dim)
    na = len(a_sh)
    blk = min(block_size, n_rows)
    if n_rows % blk:
        raise ValueError(f"n_rows {n_rows} not divisible by block {blk}")
    nb = n_rows // blk

    kernel = functools.partial(_lrpg_update_kernel, hidden, na, nb, lr,
                               entropy_coef, 1.0 / n_rows, num_actions)

    def row_spec(width):
        return pl.BlockSpec((blk, width), lambda j: (j, 0),
                            memory_space=pltpu.VMEM)

    def par_spec(shape):
        return pl.BlockSpec(shape, lambda j: (0, 0),
                            memory_space=pltpu.VMEM)

    flat_shapes = a_sh * 3
    in_specs = (
        [row_spec(obs_dim), row_spec(1), row_spec(1)]
        + [par_spec(s) for s in flat_shapes]
        + [pl.BlockSpec((1, 1), lambda j: (0, 0),
                        memory_space=pltpu.SMEM)]
    )
    out_shape = ([jax.ShapeDtypeStruct(s, jnp.float32)
                  for s in flat_shapes]
                 + [jax.ShapeDtypeStruct((8, 128), jnp.float32)])
    out_specs = ([par_spec(s) for s in flat_shapes]
                 + [pl.BlockSpec((8, 128), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM)])
    scratch_shapes = ([pltpu.VMEM(s, jnp.float32) for s in a_sh]
                      + [pltpu.VMEM((1, 128), jnp.float32)])
    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )

    def run(groups, window, t0):
        obs, act, adv = window
        n = obs.shape[0]
        args = ([obs, act.astype(jnp.int32).reshape(n, 1),
                 adv.reshape(n, 1)]
                + [arr for g in groups for arr in g]
                + [jnp.asarray(t0, jnp.int32).reshape(1, 1)])
        out = _with_mm_precision(call, mm_precision, args)
        new_groups = tuple(list(out[i * na:(i + 1) * na])
                           for i in range(3))
        return new_groups, out[3 * na][0, 0]

    return run
