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

Grid: (K, 2, NB) — NB batch blocks per phase, phases: 0 = critic
(accumulate critic grads over blocks, Adam at the last block), 1 =
actor (accumulate actor grads via dQ/da through the updated critic,
Adam + Polyak at the last block). Parameters/moments live in output
refs (constant index maps: VMEM-resident across the whole grid,
flushed to HBM once at the end), initialized from the input refs at
the first grid step.

Layout: feature-major like ops/policy_rollout.py — activations are
(features, batch_block) matrices, the batch stays on the lane axis,
LayerNorm reduces over sublanes, and h' = W^T h needs no activation
transposes. The backward pass contracts over lanes (dW = dZ . h^T) or
sublanes (dH = W^T dZ) via dot_general dimension numbers, never
materializing a transpose.

The numerical twin is `update_phase_math` below — identical
componentwise math on plain jnp arrays — which tests/test_learner_kernel
pins against agents/ddpg.py's XLA update scan AND against the kernel in
interpret mode.
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
# Feature-major MLP math (componentwise; shared by the kernel and the
# jnp twin — the same only-numpy-constants rule as physics/dynamics.py).
# A "net" is (layers, w_out, b_out): layers = [(wt (H, F_in), b (H, 1),
# ln_scale (H, 1), ln_bias (H, 1)), ...]; w_out (8, H_last) zero-row-
# padded head; activations are (F, B) with B on the lane axis.
# --------------------------------------------------------------------------

def _ln_relu(z, s, t):
    """LayerNorm (over the feature/sublane axis, flax fast-variance
    formula) + affine + relu. Returns (activation, xhat, inv, y) — the
    backward pass recomputes nothing else."""
    mu = jnp.mean(z, axis=0, keepdims=True)
    var = jnp.mean(z * z, axis=0, keepdims=True) - mu * mu
    inv = jax.lax.rsqrt(var + np.float32(_LN_EPS))
    xh = (z - mu) * inv
    y = s * xh + t
    return jnp.maximum(y, 0.0), xh, inv, y


def torso_fwd(h, layers):
    """Dense+LayerNorm+relu stack. Returns (h_out, saved) with saved =
    [(h_in, z), ...] per layer — the minimal residue for the backward
    pass (LN intermediates are recomputed from z, trading a few VPU ops
    for ~3x less VMEM residency per layer)."""
    saved = []
    for wt, b, s, t in layers:
        z = jnp.dot(wt, h, preferred_element_type=jnp.float32) + b
        saved.append((h, z))
        h, _, _, _ = _ln_relu(z, s, t)
    return h, saved


def _ln_relu_bwd(dh, z, s, t):
    """Backward through relu+affine+LayerNorm given upstream dh and the
    saved pre-LN z. Returns (dz, ds, dt)."""
    _, xh, inv, y = _ln_relu(z, s, t)
    dy = dh * (y > 0.0).astype(jnp.float32)
    ds = jnp.sum(dy * xh, axis=1, keepdims=True)
    dt = jnp.sum(dy, axis=1, keepdims=True)
    dxh = dy * s
    dz = inv * (dxh - jnp.mean(dxh, axis=0, keepdims=True)
                - xh * jnp.mean(dxh * xh, axis=0, keepdims=True))
    return dz, ds, dt


def _dw(dz, h_in):
    """dW = dZ . h_in^T — contract over the lane (batch) axis."""
    return jax.lax.dot_general(dz, h_in,
                               dimension_numbers=(((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dh(wt, dz):
    """dH = W^T dZ — contract over the sublane (output-feature) axis."""
    return jax.lax.dot_general(wt, dz,
                               dimension_numbers=(((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def torso_bwd(dh, layers, saved, need_dinput: bool):
    """Backward through torso_fwd. Returns (d_input or None, grads) with
    grads = [(dW, db, ds, dt), ...] matching `layers`."""
    grads = [None] * len(layers)
    for i in reversed(range(len(layers))):
        wt, b, s, t = layers[i]
        h_in, z = saved[i]
        dz, ds, dt = _ln_relu_bwd(dh, z, s, t)
        grads[i] = (_dw(dz, h_in), jnp.sum(dz, axis=1, keepdims=True),
                    ds, dt)
        if i > 0 or need_dinput:
            dh = _dh(wt, dz)
        else:
            dh = None
    return dh, grads


def head_fwd(h, w_out, b_out):
    """(8, H) zero-row-padded linear head -> (8, B) pre-activations."""
    return jnp.dot(w_out, h, preferred_element_type=jnp.float32) + b_out


def head_bwd(d_rows, w_out, h):
    """Backward through head_fwd given d(pre-activation) rows already
    padded to 8 (pad rows zero). Returns (dw_out, db_out, dh)."""
    dw = _dw(d_rows, h)
    db = jnp.sum(d_rows, axis=1, keepdims=True)
    return dw, db, _dh(w_out, d_rows)


def _pad_rows(d, rows: int = 8):
    """Zero-pad a (r, B) gradient to the 8-row padded head layout."""
    return jnp.concatenate(
        [d, jnp.zeros((rows - d.shape[0], d.shape[1]), jnp.float32)],
        axis=0)


# --- actor: torso + tanh head (rows 0..1) ----------------------------------

def actor_fwd(obs_fm, net):
    layers, w_out, b_out = net
    h, saved = torso_fwd(obs_fm, layers)
    pre = head_fwd(h, w_out, b_out)
    a = jnp.tanh(pre[0:2, :])
    return a, (saved, h, a)


def actor_bwd(da, net, residue):
    """Grads of the actor for upstream da (2, B). Returns flat grad list
    [dwt0, db0, ds0, dt0, ..., dw_out, db_out]."""
    layers, w_out, b_out = net
    saved, h, a = residue
    dpre = _pad_rows(da * (1.0 - a * a))
    dw_out, db_out, dh = head_bwd(dpre, w_out, h)
    _, grads = torso_bwd(dh, layers, saved, need_dinput=False)
    return [g for layer in grads for g in layer] + [dw_out, db_out]


# --- critic: layer0(obs) -> concat action -> torso rest -> linear head -----

def critic_fwd(obs_fm, act_fm, net):
    """Q row (1, B). The action enters after layer 0 (models.CriticMLP
    shape). Returns (q, residue)."""
    layers, w_out, b_out = net
    h0, saved0 = torso_fwd(obs_fm, layers[:1])
    hcat = jnp.concatenate([h0, act_fm], axis=0)
    h, saved = torso_fwd(hcat, layers[1:])
    pre = head_fwd(h, w_out, b_out)
    return pre[0:1, :], (saved0, saved, h)


def critic_bwd(dq, net, residue, need_param_grads: bool,
               need_daction: bool):
    """Backward through critic_fwd for upstream dq (1, B). Returns
    (flat param grads or None, daction (2, B) or None)."""
    layers, w_out, b_out = net
    saved0, saved, h = residue
    h0_dim = layers[0][0].shape[0]
    dw_out, db_out, dh = head_bwd(_pad_rows(dq), w_out, h)
    dhcat, grads_rest = torso_bwd(dh, layers[1:], saved,
                                  need_dinput=True)
    daction = dhcat[h0_dim:, :] if need_daction else None
    if not need_param_grads:
        return None, daction
    dh0 = dhcat[:h0_dim, :]
    _, grads0 = torso_bwd(dh0, layers[:1], saved0, need_dinput=False)
    flat = [g for layer in grads0 + grads_rest for g in layer]
    return flat + [dw_out, db_out], daction


# --- Adam + Polyak (componentwise; optax.adam semantics) --------------------

def adam_step(p, m, v, g, t, lr: float):
    """One optax.adam step: returns (p', m', v'). t is the f32 step
    index AFTER this update (optax counts from 1); the bias-correction
    powers are computed as exp(t * log(beta)) — Mosaic has no dynamic-
    exponent pow, and the ulp difference is far below the moment noise."""
    m = np.float32(_ADAM_B1) * m + np.float32(1.0 - _ADAM_B1) * g
    v = np.float32(_ADAM_B2) * v + np.float32(1.0 - _ADAM_B2) * (g * g)
    bc1 = 1.0 - jnp.exp(t * np.float32(np.log(_ADAM_B1)))
    bc2 = 1.0 - jnp.exp(t * np.float32(np.log(_ADAM_B2)))
    mhat = m / bc1
    vhat = v / bc2
    p = p - np.float32(lr) * mhat / (jnp.sqrt(vhat) + np.float32(_ADAM_EPS))
    return p, m, v


def polyak_flat(target_list, online_list, tau):
    """theta' <- theta' + tau (theta - theta') over flat operand lists."""
    return [t + tau * (o - t) for t, o in zip(target_list, online_list)]


# --------------------------------------------------------------------------
# Flat operand lists <-> flax pytrees.
#
# Kernel operand order per net: [wt0, b0, s0, t0, wt1, b1, s1, t1, ...,
# w_out (8, H), b_out (8, 1)] — the policy_rollout convention. The same
# flatten applies verbatim to optax Adam moment trees (they mirror the
# param tree structure).
# --------------------------------------------------------------------------

def actor_shapes(hidden, obs_dim: int):
    shapes = []
    f_in = obs_dim
    for h in hidden:
        shapes += [(h, f_in), (h, 1), (h, 1), (h, 1)]
        f_in = h
    return shapes + [(8, f_in), (8, 1)]


def critic_shapes(hidden, obs_dim: int, action_dim: int = 2):
    shapes = []
    f_in = obs_dim
    for i, h in enumerate(hidden):
        shapes += [(h, f_in), (h, 1), (h, 1), (h, 1)]
        f_in = h + action_dim if i == 0 else h
    return shapes + [(8, f_in), (8, 1)]


def flatten_actor(params, hidden):
    """ActorMLP tree (params or same-structure Adam moments) -> flat
    operand list (feature-major, 8-row padded head)."""
    torso = params["params"]["_Torso_0"]
    flat = []
    for i, _ in enumerate(hidden):
        d, ln = torso[f"Dense_{i}"], torso[f"LayerNorm_{i}"]
        flat += [jnp.transpose(d["kernel"]), d["bias"][:, None],
                 ln["scale"][:, None], ln["bias"][:, None]]
    head = params["params"]["Dense_0"]
    w = jnp.transpose(head["kernel"])
    b = head["bias"][:, None]
    pad = 8 - w.shape[0]
    flat.append(jnp.concatenate(
        [w, jnp.zeros((pad, w.shape[1]), jnp.float32)], axis=0))
    flat.append(jnp.concatenate([b, jnp.zeros((pad, 1), jnp.float32)],
                                axis=0))
    return flat


def unflatten_actor(flat, hidden, action_dim: int = 2):
    """Inverse of flatten_actor (back to the flax tree layout)."""
    torso = {}
    for i, _ in enumerate(hidden):
        wt, b, s, t = flat[4 * i:4 * i + 4]
        torso[f"Dense_{i}"] = {"kernel": jnp.transpose(wt),
                               "bias": b[:, 0]}
        torso[f"LayerNorm_{i}"] = {"scale": s[:, 0], "bias": t[:, 0]}
    w_out, b_out = flat[-2], flat[-1]
    return {"params": {"_Torso_0": torso,
                       "Dense_0": {
                           "kernel": jnp.transpose(w_out[:action_dim]),
                           "bias": b_out[:action_dim, 0]}}}


def flatten_critic(params, hidden):
    """CriticMLP tree (or same-structure Adam moments) -> flat operand
    list. CriticMLP builds Dense_i/LayerNorm_i inline (no _Torso), with
    Dense_{n} as the 1-unit head (padded to 8 rows)."""
    p = params["params"]
    flat = []
    for i, _ in enumerate(hidden):
        d, ln = p[f"Dense_{i}"], p[f"LayerNorm_{i}"]
        flat += [jnp.transpose(d["kernel"]), d["bias"][:, None],
                 ln["scale"][:, None], ln["bias"][:, None]]
    head = p[f"Dense_{len(hidden)}"]
    w = jnp.transpose(head["kernel"])          # (1, H)
    b = head["bias"][:, None]
    flat.append(jnp.concatenate(
        [w, jnp.zeros((7, w.shape[1]), jnp.float32)], axis=0))
    flat.append(jnp.concatenate([b, jnp.zeros((7, 1), jnp.float32)],
                                axis=0))
    return flat


def unflatten_critic(flat, hidden):
    p = {}
    for i, _ in enumerate(hidden):
        wt, b, s, t = flat[4 * i:4 * i + 4]
        p[f"Dense_{i}"] = {"kernel": jnp.transpose(wt), "bias": b[:, 0]}
        p[f"LayerNorm_{i}"] = {"scale": s[:, 0], "bias": t[:, 0]}
    w_out, b_out = flat[-2], flat[-1]
    p[f"Dense_{len(hidden)}"] = {"kernel": jnp.transpose(w_out[:1]),
                                 "bias": b_out[:1, 0]}
    return {"params": p}


def _as_net(flat, num_layers: int):
    """Flat operand list -> (layers, w_out, b_out) view."""
    layers = [tuple(flat[4 * i:4 * i + 4]) for i in range(num_layers)]
    return layers, flat[-2], flat[-1]


# --------------------------------------------------------------------------
# One update iteration, componentwise — called per (phase, block) by both
# the kernel and the jnp twin.
# --------------------------------------------------------------------------

def critic_phase_block(actor_t, critic, critic_t, obs_fm, act_fm, rew,
                       done, gamma: float, inv_batch: float):
    """Critic-TD gradient contribution of one batch block. Returns
    (flat critic grads, summed loss contribution * inv_batch)."""
    a_next, _ = actor_fwd(obs_fm["next"], actor_t)
    q_next, _ = critic_fwd(obs_fm["next"], a_next, critic_t)
    y = rew + np.float32(gamma) * (1.0 - done) * q_next
    q, residue = critic_fwd(obs_fm["obs"], act_fm, critic)
    td = q - y
    dq = np.float32(2.0 * inv_batch) * td
    grads, _ = critic_bwd(dq, critic, residue, need_param_grads=True,
                          need_daction=False)
    loss = np.float32(inv_batch) * jnp.sum(td * td)
    return grads, loss


def actor_phase_block(actor, critic, obs_fm, inv_batch: float):
    """Actor gradient contribution of one batch block: d(-mean Q(s,
    pi(s)))/d(actor params) through the (already updated) critic.
    Returns (flat actor grads, summed loss contribution * inv_batch)."""
    a, res_a = actor_fwd(obs_fm, actor)
    q, res_c = critic_fwd(obs_fm, a, critic)
    dq = jnp.full_like(q, np.float32(-inv_batch))
    _, daction = critic_bwd(dq, critic, res_c, need_param_grads=False,
                            need_daction=True)
    grads = actor_bwd(daction, actor, res_a)
    loss = np.float32(-inv_batch) * jnp.sum(q)
    return grads, loss


# --------------------------------------------------------------------------
# jnp twin of the whole kernel (tests pin it against agents/ddpg.py's
# XLA update scan AND against the kernel in interpret mode).
# --------------------------------------------------------------------------

def update_phase_math(actor, critic, actor_t, critic_t, m_a, v_a, m_c,
                      v_c, batches, t0, hidden, *, actor_lr, critic_lr,
                      gamma, tau, num_blocks: int = 1):
    """K sequential DDPG updates on flat operand lists, batch blocks
    processed exactly as the kernel grid does (grads accumulated over
    blocks, Adam at the last). batches: (obs (K, Bm, F), action
    (K, Bm, 2), reward (K, Bm), next_obs (K, Bm, F), done (K, Bm)).
    Returns (actor, critic, actor_t, critic_t, m_a, v_a, m_c, v_c,
    closs (K,), aloss (K,))."""
    n = len(hidden)
    k_updates, bm = batches[0].shape[0], batches[0].shape[1]
    blk = bm // num_blocks
    inv = 1.0 / bm
    closses, alosses = [], []
    for k in range(k_updates):
        obs, act, rew, nobs, done = (x[k] for x in batches)
        tk = (t0 + k + 1).astype(jnp.float32)
        # --- phase 0: critic ---------------------------------------------
        cg, closs = None, jnp.float32(0.0)
        for j in range(num_blocks):
            sl = slice(j * blk, (j + 1) * blk)
            fm = {"obs": jnp.transpose(obs[sl]),
                  "next": jnp.transpose(nobs[sl])}
            g, ls = critic_phase_block(
                _as_net(actor_t, n), _as_net(critic, n),
                _as_net(critic_t, n), fm, jnp.transpose(act[sl]),
                rew[sl][None, :], done[sl].astype(jnp.float32)[None, :],
                gamma, inv)
            cg = g if cg is None else [a + b for a, b in zip(cg, g)]
            closs = closs + ls
        new = [adam_step(p, m, v, g, tk, critic_lr)
               for p, m, v, g in zip(critic, m_c, v_c, cg)]
        critic = [x[0] for x in new]
        m_c = [x[1] for x in new]
        v_c = [x[2] for x in new]
        # --- phase 1: actor (through the updated critic) ------------------
        ag, aloss = None, jnp.float32(0.0)
        for j in range(num_blocks):
            sl = slice(j * blk, (j + 1) * blk)
            g, ls = actor_phase_block(
                _as_net(actor, n), _as_net(critic, n),
                jnp.transpose(obs[sl]), inv)
            ag = g if ag is None else [a + b for a, b in zip(ag, g)]
            aloss = aloss + ls
        new = [adam_step(p, m, v, g, tk, actor_lr)
               for p, m, v, g in zip(actor, m_a, v_a, ag)]
        actor = [x[0] for x in new]
        m_a = [x[1] for x in new]
        v_a = [x[2] for x in new]
        actor_t = polyak_flat(actor_t, actor, np.float32(tau))
        critic_t = polyak_flat(critic_t, critic, np.float32(tau))
        closses.append(closs)
        alosses.append(aloss)
    return (actor, critic, actor_t, critic_t, m_a, v_a, m_c, v_c,
            jnp.stack(closses), jnp.stack(alosses))
