#!/usr/bin/env python
"""Isolate the pixel-DDPG update-phase cost on real TPU.

Round-4 diagnosis driver: e2e pixel training is ~221-258k env-steps/s at
512 envs while rollout-only runs ~800k, and the ~12 ms/step gap has been
insensitive to encoder (conv vs patch), precision (f32 vs bf16), batch
shape (16x256 / 8x512 / 4x1024), polyak cadence, sampling strategy, and
ring-copy elimination. This script times the phase's pieces standalone:

  presample   — K-minibatch gather from the ring
  updates     — the K-update scan on PREcomputed batches (no sampling)
  one_update  — a single update (serial-depth floor)
  fwd         — one critic forward at batch rows (compute floor)

Usage: python experiments/pixel_update_microbench.py [--envs 512]
Prints one JSON line per timing; D2H-synced (tunnel block_until_ready
resolves on enqueue — CLAUDE.md).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(name, fn, sync, n=10, **extra):
    t0 = time.perf_counter()
    out = fn()
    sync(out)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"leg": name, "best_ms": round(best * 1e3, 3),
                      "compile_s": round(compile_s, 1), **extra}),
          flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=512)
    ap.add_argument("--updates", type=int, default=16)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--encoder", default="conv")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cartpoleplusplus_tpu import CartPole3D
    from cartpoleplusplus_tpu.agents import DDPG, DDPGConfig
    from cartpoleplusplus_tpu.agents.common import replay_presample
    from cartpoleplusplus_tpu.env.pixels import RenderConfig
    from cartpoleplusplus_tpu.physics.params import continuous_params
    from cartpoleplusplus_tpu.train import enable_compile_cache

    enable_compile_cache()
    rcfg = RenderConfig(dtype="bfloat16", grayscale=True, obs_uint8=True,
                        frame_diff=True, frame_diff_gain=4.0)
    env = CartPole3D(continuous_params(), num_envs=args.envs,
                     obs_mode="pixels", render_config=rcfg)
    agent = DDPG(env, DDPGConfig(rollout_steps=8,
                                 updates_per_step=args.updates,
                                 batch_size=args.batch,
                                 warmup_env_steps=0, dtype=args.dtype,
                                 encoder=args.encoder,
                                 replay_capacity_per_env=256))
    st = agent.init(0)
    # Fill some replay via real train steps (also warms the e2e compile).
    step = jax.jit(agent.train_step, donate_argnums=(0,))
    for _ in range(4):
        st, m = step(st)
    _ = float(m["reward_mean"])

    K, B = args.updates, args.batch
    presample = replay_presample(agent.replay, agent.cfg.sample,
                                 agent.cfg.batch_size, 1, None)
    keys = jax.random.split(jax.random.PRNGKey(1), K)

    ps = jax.jit(lambda s, ks: presample(s, ks))
    timed("presample", lambda: ps(st, keys),
          lambda out: float(out[2][0, 0]), K=K, B=B)
    batches = ps(st, keys)

    def updates_only(s, xs):
        def body(carry, x):
            return agent._update_once(carry, x)
        s, metrics = jax.lax.scan(body, s, xs)
        return s, metrics

    upd = jax.jit(updates_only, donate_argnums=(0,))
    box = {"st": st}

    def run_upd():
        s2, metrics = upd(box["st"], batches)
        box["st"] = s2           # ping-pong so donation stays honest
        return s2, metrics

    timed("updates_scan", run_upd,
          lambda out: float(out[1]["critic_loss"][-1]), K=K, B=B)
    st_keep = box["st"]

    one_b = jax.tree.map(lambda a: a[0], batches)
    one = jax.jit(lambda s, b: agent._update_once(s, b))
    timed("one_update", lambda: one(st_keep, one_b),
          lambda out: float(out[1]["critic_loss"]), B=B)

    fwd = jax.jit(lambda c, o, a: jnp.sum(agent.critic_net.apply(c, o, a)))
    timed("critic_fwd", lambda: fwd(st_keep.critic, one_b[0], one_b[1]),
          lambda out: float(out), B=B)

    cg = jax.jit(lambda c, b: jax.grad(
        lambda cc: agent._critic_loss(cc, st_keep.actor_target,
                                      st_keep.critic_target, b))(c))
    timed("critic_grad", lambda: cg(st_keep.critic, one_b),
          lambda out: float(jax.tree.leaves(out)[0][0].ravel()[0]), B=B)


if __name__ == "__main__":
    main()
