#!/usr/bin/env python
"""NAF fused-kernel vs XLA-twin drift: random walk or systematic bias?

Follow-up to experiments/naf_perturb_ab.py (which refuted the
"rounding-scale perturbations flip long runs" hypothesis): if the
kernel's numerical deviation were rounding-equivalent, the param-space
gap between the kernel and its componentwise twin — evolved from the
SAME state on the SAME batch stream — should grow like a random walk
(||delta|| ~ sqrt(n_updates), signs uncorrelated across segments). A
systematic defect (accumulation order, LN eps placement, Adam eps
ordering, Cholesky clamp) shows up as near-linear growth and a stable
drift direction (high cosine similarity between successive segment
deltas).

Runs both learners segment by segment on hardware (or --cpu interpret),
printing per-segment ||delta||, the growth-exponent fit, and the mean
cosine between successive per-segment displacement vectors.

Usage: python experiments/naf_kernel_drift.py [--segments 24]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", type=int, default=24)
    ap.add_argument("--k-updates", type=int, default=8)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--kernel-precision", default=None,
                    help="in-kernel matmul precision (e.g. 'highest'); "
                         "None = Mosaic default lowering")
    ap.add_argument("--twin-precision", default=None,
                    help="ambient matmul precision for the XLA twin")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cartpoleplusplus_tpu import CartPole3D
    from cartpoleplusplus_tpu.agents import NAF, NAFConfig
    from cartpoleplusplus_tpu.ops import learner_kernel as lk
    from cartpoleplusplus_tpu.physics.params import continuous_params
    from cartpoleplusplus_tpu.train import enable_compile_cache

    enable_compile_cache()
    env = CartPole3D(continuous_params(), num_envs=128)
    cfg = NAFConfig(learner="xla")
    agent = NAF(env, cfg)
    hidden = tuple(cfg.hidden)
    st = agent.init(0)
    obs_dim = env.obs_shape[0]

    adam = agent._adam_state(st.opt)
    groups = (lk.flatten_naf(st.params, hidden),
              lk.flatten_naf(st.target, hidden),
              lk.flatten_naf(adam.mu, hidden),
              lk.flatten_naf(adam.nu, hidden))
    groups_k = jax.tree.map(jnp.copy, groups)

    K, B = args.k_updates, args.batch
    interp = jax.default_backend() != "tpu"
    run_k = jax.jit(lk.naf_update_phase(
        hidden, obs_dim, K, B, lr=cfg.lr, gamma=cfg.gamma, tau=cfg.tau,
        max_grad_norm=cfg.max_grad_norm, interpret=interp,
        mm_precision=args.kernel_precision))

    mgn = cfg.max_grad_norm
    twin_prec = args.twin_precision

    def run_twin(groups, batches, t0):
        def go():
            return lk.naf_update_phase_math(
                *groups, batches, t0, hidden, lr=cfg.lr,
                gamma=cfg.gamma, tau=cfg.tau, max_grad_norm=mgn,
                num_blocks=1)
        if twin_prec is None:
            return go()
        with jax.default_matmul_precision(twin_prec):
            return go()

    run_t = jax.jit(run_twin)

    def batches_for(seg):
        ks = jax.random.split(jax.random.PRNGKey(1000 + seg), 5)
        obs = jax.random.normal(ks[0], (K, B, obs_dim)) * 0.3
        act = jax.random.uniform(ks[1], (K, B, 2), minval=-1.0,
                                 maxval=1.0)
        rew = jax.random.uniform(ks[2], (K, B))
        nobs = obs + 0.05 * jax.random.normal(ks[3], (K, B, obs_dim))
        done = jax.random.bernoulli(ks[4], 0.1, (K, B))
        return (obs, act, rew, nobs, done)

    def flat_params(g):
        return np.concatenate([np.asarray(a).ravel() for a in g[0]])

    deltas, norms = [], []
    prev_gap = None
    t0 = jnp.int32(0)
    for seg in range(args.segments):
        b = batches_for(seg)
        out_k = run_k(groups_k, b, t0)
        groups_k = out_k[0] if isinstance(out_k[0], tuple) and \
            len(out_k[0]) == 4 else out_k[:4]
        out_t = run_t(groups, b, t0)
        groups = tuple(out_t[:4])
        t0 = t0 + jnp.int32(K)
        gap = flat_params(groups_k) - flat_params(groups)
        norms.append(float(np.linalg.norm(gap)))
        if prev_gap is not None:
            disp = gap - prev_gap
            pdisp = prev_gap
            denom = (np.linalg.norm(disp) * np.linalg.norm(pdisp))
            deltas.append(float(np.dot(disp, pdisp) / denom)
                          if denom > 0 else 0.0)
        prev_gap = gap
        print(json.dumps({"segment": seg, "updates": (seg + 1) * K,
                          "gap_norm": norms[-1]}), flush=True)

    n = np.arange(1, len(norms) + 1, dtype=np.float64)
    mask = np.asarray(norms) > 0
    slope = float(np.polyfit(np.log(n[mask]),
                             np.log(np.asarray(norms)[mask]), 1)[0])
    # Localize: which param tensors carry the drift (relative to their
    # own scale) — points at the defective op (LN eps? Cholesky head?
    # a specific matmul's accumulation?).
    per = []
    for i, (a, b) in enumerate(zip(groups_k[0], groups[0])):
        a, b = np.asarray(a), np.asarray(b)
        gap_n = float(np.linalg.norm(a - b))
        ref_n = float(np.linalg.norm(b)) or 1.0
        per.append((gap_n / ref_n, i, tuple(a.shape), gap_n))
    per.sort(reverse=True)
    for rel, i, shape, gap_n in per[:6]:
        print(json.dumps({"tensor": i, "shape": list(shape),
                          "rel_gap": round(rel, 6),
                          "gap_norm": round(gap_n, 6)}), flush=True)
    print(json.dumps({
        "kernel_precision": args.kernel_precision,
        "twin_precision": args.twin_precision,
        "growth_exponent": round(slope, 3),
        "interpretation": ("~1.0 = systematic drift (defect); "
                           "~0.5 = random walk (rounding)"),
        "mean_cos_disp_vs_gap": round(float(np.mean(deltas)), 3),
        "final_gap_norm": norms[-1],
        "param_norm": float(np.linalg.norm(flat_params(groups))),
    }), flush=True)


if __name__ == "__main__":
    main()
