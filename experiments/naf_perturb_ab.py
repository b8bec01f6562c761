#!/usr/bin/env python
"""NAF kernel-learner bimodality: hypothesis-vs-mechanism experiment.

VERDICT r3 item 5. Round 3 measured: the fused NAF update kernel matches
its XLA twin to 1e-5 per update on hardware, yet LONG kernel-mode runs go
bimodal across seeds/horizons (200.0 down to 3.0 — BASELINE.md:127). The
standing hypothesis: NAF's solving recipes sit on a collapse-basin
boundary, so Adam-rounding-scale perturbations flip long runs. This
script separates that hypothesis from "the kernel has a real numerical
defect":

  Train with the XLA learner (the known-good quality path) while
  injecting a tiny RELATIVE param perturbation (default 1e-5, the
  measured kernel-vs-twin scale) after every dispatch, from a seeded
  stream. If XLA+perturb also goes bimodal across the same seed/horizon
  matrix, the mechanism is basin-boundary sensitivity (document + widen
  the basin); if XLA+perturb solves everywhere the kernel fails, the
  kernel's accumulated deviation is NOT rounding-equivalent and hides a
  real defect (accumulation order / LN eps / Adam eps ordering).

Usage (real TPU; serialize with other TPU jobs):
  python experiments/naf_perturb_ab.py --seed 0 --horizon 80000 \
      --perturb 1e-5 [--learner xla] [--num-envs 1024] [--dispatch 16]

Prints one JSON line with the final deterministic eval.
"""

import argparse
import json
import os
import sys
import time

# python puts the script's dir (experiments/) on sys.path, not the repo
# root; PYTHONPATH would break the axon TPU plugin registration
# (CLAUDE.md), so add the root here instead.
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402,F401


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--horizon", type=int, default=80_000,
                    help="per-env env-steps")
    ap.add_argument("--perturb", type=float, default=1e-5,
                    help="relative param perturbation per dispatch "
                         "(0 = clean control run)")
    ap.add_argument("--learner", default="xla",
                    choices=["xla", "kernel", "auto"])
    ap.add_argument("--num-envs", type=int, default=1024)
    ap.add_argument("--dispatch", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cartpoleplusplus_tpu import CartPole3D
    from cartpoleplusplus_tpu.agents import NAF, NAFConfig
    from cartpoleplusplus_tpu.physics.params import continuous_params
    from cartpoleplusplus_tpu.train import enable_compile_cache

    enable_compile_cache()

    env = CartPole3D(continuous_params(), num_envs=args.num_envs)
    cfg = NAFConfig(learner=args.learner)
    agent = NAF(env, cfg)
    st = agent.init(args.seed)

    n_calls = args.horizon // cfg.rollout_steps
    k = args.dispatch
    scan = agent.make_train_scan(k)

    # Perturbation: multiplicative (1 + eps*N(0,1)) on the ONLINE params
    # only (the kernel's rounding also walks moments/targets, but the
    # hypothesis is that param-space deviations at this scale flip the
    # run; targets then track the perturbed params through Polyak).
    def perturb(st, key):
        leaves, treedef = jax.tree.flatten(st.params)
        keys = jax.random.split(key, len(leaves))
        new = [p * (1.0 + args.perturb
                    * jax.random.normal(kk, p.shape, p.dtype))
               for p, kk in zip(leaves, keys)]
        return st._replace(params=jax.tree.unflatten(treedef, new))

    perturb = jax.jit(perturb)
    pkey = jax.random.PRNGKey(args.seed + 90210)

    t0 = time.perf_counter()
    i = 0
    while i < n_calls:
        st, m = scan(st)
        if args.perturb > 0:
            pkey, sub = jax.random.split(pkey)
            st = perturb(st, sub)
        i += k
        if i % (max(n_calls // 8, k)) < k:
            print(json.dumps({"call": i,
                              "reward_mean": float(m["reward_mean"][-1]),
                              "loss": float(m["loss"][-1])}),
                  file=sys.stderr, flush=True)
    train_s = time.perf_counter() - t0

    stats = jax.jit(agent.evaluate, static_argnums=(1, 2))(
        st, 220, args.seed + 1)
    out = {"seed": args.seed, "horizon": args.horizon,
           "perturb": args.perturb, "learner": args.learner,
           "kernel_mode": agent.kernel_mode,
           "train_seconds": round(train_s, 1),
           **{k2: float(v) for k2, v in stats.items()}}
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
