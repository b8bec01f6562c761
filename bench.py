#!/usr/bin/env python
"""Headline benchmark: env-steps/s per chip at 4096 envs (BASELINE.json:5).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is relative to the driver-set 10M env-steps/s/chip north star
(the reference publishes no numbers — BASELINE.json:13).
"""

import json
import os
import sys
import threading
import time

_T0 = time.perf_counter()
# Wall-clock budget (seconds). The driver runs bench.py under `timeout 400`
# and records the tail; round 3 produced NO number (BENCH_r03.json rc=124)
# because every parity compile preceded the single headline print and a cold
# cache + tunnel stall ate the 400 s. Defense in depth now:
#   1. the headline JSON prints (flushed) immediately after the FIRST
#      measurement — one compile stands between start and the number;
#   2. each optional parity leg only starts if enough budget remains;
#   3. a watchdog thread hard-exits 0 at the budget so a stalled compile in
#      a later leg can never turn into rc=124 with the number already out.
_BUDGET = float(os.environ.get("BENCH_TIME_BUDGET", "350"))


def _elapsed() -> float:
    return time.perf_counter() - _T0


def _remaining() -> float:
    return _BUDGET - _elapsed()


def _arm_watchdog():
    """After the headline is printed: never let a later (optional) leg
    stall past the budget. os._exit skips atexit/GC — fine here, all
    output is flushed at print time."""

    def _fire():
        time.sleep(max(_remaining(), 0.0))
        print(json.dumps({"watchdog": "budget exhausted after headline; "
                          "exiting 0", "elapsed_s": round(_elapsed(), 1)}),
              file=sys.stderr, flush=True)
        os._exit(0)

    t = threading.Thread(target=_fire, daemon=True)
    t.start()


def main():
    if "--suite" in sys.argv or os.environ.get("BENCH_SUITE") == "1":
        return bench_suite()
    # Persistent compilation cache: the fused-kernel compile is minutes over
    # the TPU tunnel; caching makes repeated bench invocations start fast.
    import jax

    cache_dir = os.environ.get("JAX_CACHE_DIR",
                               os.path.join(os.path.dirname(
                                   os.path.abspath(__file__)), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    # BENCH_MM_PREC wraps the whole bench in jax.default_matmul_precision
    # (e.g. "bfloat16" makes every f32 dot a single MXU pass) — a probe
    # knob for the matmul-bound kernels; quality implications are
    # validated separately before any default changes.
    mm_prec = os.environ.get("BENCH_MM_PREC")
    if mm_prec:
        jax.config.update("jax_default_matmul_precision", mm_prec)

    num_envs = int(os.environ.get("BENCH_NUM_ENVS", "4096"))
    # Large step count amortizes the ~15-50 ms tunnel round-trip so the
    # reported rate reflects the engine, not dispatch latency.
    num_steps = int(os.environ.get("BENCH_NUM_STEPS", "4096"))

    from cartpoleplusplus_tpu import CartPole3D, CartPoleParams
    from cartpoleplusplus_tpu.bench import measure_env_steps_per_sec
    from cartpoleplusplus_tpu.ops import best_rollout
    from cartpoleplusplus_tpu.physics.params import continuous_params

    # BENCH_CONFIG=continuous benches config 3 (pushes + shaped reward);
    # BENCH_CONFIG=ddpg benches the END-TO-END actor-learner train step
    # (fused Pallas actor rollout + replay + gradient updates);
    # default is the discrete config-2 shape (BASELINE.json:8).
    config = os.environ.get("BENCH_CONFIG", "discrete")
    if config == "ddpg":
        return bench_ddpg(num_envs, num_steps)
    if config == "dqn":
        return bench_dqn(num_envs, num_steps)
    if config == "naf":
        return bench_naf(num_envs, num_steps)
    if config == "lrpg":
        return bench_lrpg(num_envs, num_steps)
    if config == "pixels":
        return bench_pixels(num_envs, num_steps)
    if config == "ddpg_pixels":
        return bench_ddpg_pixels(num_envs, num_steps)
    params = continuous_params() if config == "continuous" \
        else CartPoleParams()
    env = CartPole3D(params, num_envs=num_envs)
    rollout, impl = best_rollout(env, num_steps)
    try:
        stats = measure_env_steps_per_sec(env, num_steps=num_steps,
                                          rollout=rollout)
    except Exception as e:  # lowering/compile failure -> XLA-scan fallback
        if impl == "xla_scan":
            raise
        print(f"pallas path failed ({type(e).__name__}: {e}); "
              "falling back to xla_scan", file=sys.stderr, flush=True)
        from cartpoleplusplus_tpu.ops import reference_rollout
        rollout, impl = reference_rollout(env, num_steps), "xla_scan"
        stats = measure_env_steps_per_sec(env, num_steps=num_steps,
                                          rollout=rollout)
    stats["impl"] = impl

    # THE deliverable: the headline number, printed the moment it exists
    # (and echoed as a parseable stats line) — everything after this point
    # is optional verification running under the watchdog.
    target = 10_000_000.0
    print(json.dumps({
        "metric": "env_steps_per_sec_per_chip_4096envs",
        "value": round(stats["env_steps_per_sec"], 1),
        "unit": "env-steps/s",
        "vs_baseline": round(stats["env_steps_per_sec"] / target, 4),
    }), flush=True)
    print(json.dumps(stats), file=sys.stderr, flush=True)
    _arm_watchdog()

    if impl == "pallas_fused":
        # Per-round hardware parity checks (round-1/2 VERDICT asks): the
        # physics rollout kernel, the actor-in-the-loop rollout THROUGH
        # THE ENV-BLOCKED GRID (nb=2), and the fused K-update learner
        # kernel, each vs its XLA twin on this chip. Each leg is a fresh
        # compile (seconds warm, minutes cold over the tunnel) — run only
        # while budget remains; the watchdog bounds a mid-leg stall.
        legs = (("hw_parity", lambda: verify_kernel_parity(env)),
                ("hw_parity_policy", verify_policy_rollout_parity),
                ("hw_parity_learner", verify_learner_kernel_parity))
        for key, fn in legs:
            if _remaining() < 45.0:
                stats[key] = "skipped:budget"
                continue
            stats[key] = fn()
    else:
        stats["hw_parity"] = "n/a"
    stats["elapsed_s"] = round(_elapsed(), 1)
    # Final line (the driver parses the LAST JSON line of the tail —
    # BENCH_r01's `parsed` is the stats dict): full stats incl. parity.
    print(json.dumps(stats), file=sys.stderr, flush=True)


def verify_kernel_parity(env, num_steps: int = 64) -> str:
    """On-hardware Pallas-kernel vs XLA-scan parity (round-1 VERDICT asks
    for one per round in the driver bench; CI covers interpret mode only).

    Runs both implementations for a short window from the same reset state
    and compares final physics states (allclose, f32 fusion tolerance) and
    the obs+reward checksum. Shapes are fixed so the two small compiles hit
    the persistent cache after the first round. BENCH_VERIFY=0 skips."""
    if os.environ.get("BENCH_VERIFY", "1") != "1":
        return "skipped"
    import jax
    import numpy as np
    from cartpoleplusplus_tpu.ops import pallas_rollout, reference_rollout

    try:
        state, _ = jax.jit(env.reset)(0)
        s_k, acc_k = pallas_rollout(env, num_steps)(state)
        acc_k = float(acc_k)  # D2H sync (tunnel: block_until_ready lies)
        state, _ = jax.jit(env.reset)(0)
        s_r, acc_r = reference_rollout(env, num_steps)(state)
        acc_r = float(acc_r)
        for name in ("pos", "vel", "s", "sd"):
            np.testing.assert_allclose(
                np.asarray(getattr(s_k.phys, name)),
                np.asarray(getattr(s_r.phys, name)),
                rtol=1e-5, atol=1e-5, err_msg=f"phys.{name}")
        assert np.array_equal(np.asarray(s_k.steps), np.asarray(s_r.steps))
        assert np.array_equal(np.asarray(s_k.episode),
                              np.asarray(s_r.episode))
        assert abs(acc_k - acc_r) <= 1e-4 * max(1.0, abs(acc_r)), \
            f"checksum {acc_k} vs {acc_r}"
        return "ok"
    except AssertionError as e:
        print(f"HARDWARE PARITY FAILURE: {e}", file=sys.stderr)
        return "FAIL"
    except Exception as e:  # compile/tunnel trouble: report, don't block
        print(f"parity check errored: {type(e).__name__}: {e}",
              file=sys.stderr)
        return f"error:{type(e).__name__}"


def verify_policy_rollout_parity(num_envs: int = 2048,
                                 num_steps: int = 16) -> str:
    """On-hardware parity of the fused actor-in-the-loop rollout
    (ops/policy_rollout.py) vs its XLA twin — run at 2048 envs with
    block_envs=1024 so the (num_blocks, T) env-blocked grid (nb=2) is
    exercised on real hardware every driver round, not just in
    interpret-mode CI. Fixed shapes hit the persistent compile cache
    after the first round. BENCH_VERIFY=0 skips."""
    if os.environ.get("BENCH_VERIFY", "1") != "1":
        return "skipped"
    import jax
    import numpy as np
    from cartpoleplusplus_tpu import CartPole3D
    from cartpoleplusplus_tpu.agents import DDPG, DDPGConfig
    from cartpoleplusplus_tpu.ops.policy_rollout import (
        policy_rollout, reference_policy_rollout)
    from cartpoleplusplus_tpu.physics.params import continuous_params

    try:
        env = CartPole3D(continuous_params(), num_envs=num_envs)
        agent = DDPG(env, DDPGConfig(learner="xla"))
        hidden = tuple(agent.cfg.hidden)
        st = agent.init(0)
        args = (st.env_state, st.obs, st.noise, st.actor,
                st.env_steps, agent.cfg.ou_sigma)
        run_k = jax.jit(policy_rollout(env, hidden, agent.cfg.ou_theta,
                                       num_steps, block_envs=1024))
        run_r = jax.jit(reference_policy_rollout(agent, num_steps))
        s_k, obs_k, noise_k, traj_k = run_k(*args)
        _ = float(obs_k[0, 0])   # D2H sync
        s_r, obs_r, noise_r, traj_r = run_r(*args)
        _ = float(obs_r[0, 0])
        # Tolerance sized to catch layout/blocking regressions (gross
        # errors): the kernel's MXU actor matmul rounds differently from
        # the XLA twin's, and the per-step action deltas integrate into
        # the physics state over num_steps (measured 4/49152 elements at
        # 2.2e-5 abs / 1.1e-4 rel at 16384 envs). steps/done/actions
        # below stay exact/tight — a flipped termination would cascade.
        for name in ("pos", "vel", "s", "sd"):
            np.testing.assert_allclose(
                np.asarray(getattr(s_k.phys, name)),
                np.asarray(getattr(s_r.phys, name)),
                rtol=1e-3, atol=1e-4, err_msg=f"phys.{name}")
        assert np.array_equal(np.asarray(s_k.steps), np.asarray(s_r.steps))
        np.testing.assert_array_equal(np.asarray(traj_k[3]),
                                      np.asarray(traj_r[3]))  # done
        np.testing.assert_allclose(np.asarray(traj_k[1]),
                                   np.asarray(traj_r[1]),
                                   rtol=1e-3, atol=1e-4)      # actions
        np.testing.assert_allclose(np.asarray(noise_k),
                                   np.asarray(noise_r),
                                   rtol=1e-5, atol=1e-6)
        return "ok"
    except AssertionError as e:
        print(f"POLICY-ROLLOUT PARITY FAILURE: {e}", file=sys.stderr)
        return "FAIL"
    except Exception as e:
        print(f"policy parity errored: {type(e).__name__}: {e}",
              file=sys.stderr)
        return f"error:{type(e).__name__}"


def verify_learner_kernel_parity(k_updates: int = 2,
                                 batch: int = 1024) -> str:
    """On-hardware parity of the fused DDPG K-update learner kernel
    (ops/learner_kernel.py::ddpg_update_phase) vs its componentwise XLA
    twin (update_phase_math) on synthetic batches — catches Mosaic/
    layout regressions the interpret-mode CI can't. BENCH_VERIFY=0
    skips."""
    if os.environ.get("BENCH_VERIFY", "1") != "1":
        return "skipped"
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cartpoleplusplus_tpu import CartPole3D
    from cartpoleplusplus_tpu.agents import DDPG, DDPGConfig
    from cartpoleplusplus_tpu.ops import learner_kernel as lk
    from cartpoleplusplus_tpu.physics.params import continuous_params

    try:
        env = CartPole3D(continuous_params(), num_envs=128)
        cfg = DDPGConfig(learner="xla")
        agent = DDPG(env, cfg)
        hidden = tuple(cfg.hidden)
        st = agent.init(0)
        obs_dim = env.obs_shape[0]
        groups = (lk.flatten_actor(st.actor, hidden),
                  lk.flatten_critic(st.critic, hidden),
                  lk.flatten_actor(st.actor_target, hidden),
                  lk.flatten_critic(st.critic_target, hidden),
                  lk.flatten_actor(st.actor_opt[0].mu, hidden),
                  lk.flatten_actor(st.actor_opt[0].nu, hidden),
                  lk.flatten_critic(st.critic_opt[0].mu, hidden),
                  lk.flatten_critic(st.critic_opt[0].nu, hidden))
        ks = jax.random.split(jax.random.PRNGKey(7), 5)
        obs = jax.random.normal(ks[0], (k_updates, batch, obs_dim)) * 0.3
        act = jax.random.uniform(ks[1], (k_updates, batch, 2),
                                 minval=-1.0, maxval=1.0)
        rew = jax.random.uniform(ks[2], (k_updates, batch))
        nobs = obs + 0.05 * jax.random.normal(ks[3],
                                              (k_updates, batch, obs_dim))
        done = jax.random.bernoulli(ks[4], 0.1, (k_updates, batch))
        batches = (obs, act, rew, nobs, done)
        t0 = jnp.int32(0)
        run_k = jax.jit(lk.ddpg_update_phase(
            hidden, obs_dim, k_updates, batch, actor_lr=cfg.actor_lr,
            critic_lr=cfg.critic_lr, gamma=cfg.gamma, tau=cfg.tau,
            block_size=512))
        new_k, closs_k, aloss_k = run_k(groups, batches, t0)
        _ = float(closs_k[0])   # D2H sync
        run_r = jax.jit(functools_partial_math(lk, hidden, cfg))
        out_r = run_r(groups, batches, t0)
        _ = float(out_r[-2][0])
        # Tolerance sized to catch layout/Mosaic regressions (gross
        # errors), not rsqrt rounding: on hardware the Adam update's
        # Mosaic rsqrt differs from XLA's by up to ~5e-4 relative on
        # isolated elements (measured 1/10752 at 4.1e-5 abs).
        tol = dict(rtol=2e-3, atol=2e-4)
        for g_k, g_r in zip(new_k, out_r[:8]):
            for a, b in zip(g_k, g_r):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           **tol)
        np.testing.assert_allclose(np.asarray(closs_k),
                                   np.asarray(out_r[8]), **tol)
        np.testing.assert_allclose(np.asarray(aloss_k),
                                   np.asarray(out_r[9]), **tol)
        return "ok"
    except AssertionError as e:
        print(f"LEARNER-KERNEL PARITY FAILURE: {e}", file=sys.stderr)
        return "FAIL"
    except Exception as e:
        print(f"learner parity errored: {type(e).__name__}: {e}",
              file=sys.stderr)
        return f"error:{type(e).__name__}"


def functools_partial_math(lk, hidden, cfg):
    """The XLA twin of ddpg_update_phase with the bench config baked in
    (module-level so both jits share one source of truth)."""
    def run(groups, batches, t0):
        return lk.update_phase_math(
            *groups, batches, t0, hidden, actor_lr=cfg.actor_lr,
            critic_lr=cfg.critic_lr, gamma=cfg.gamma, tau=cfg.tau,
            num_blocks=2)
    return run


def _time_train(agent, rollout: int, num_envs: int, num_steps: int,
                trials: int = 3):
    """Time an agent's end-to-end train loop: BENCH_SCAN train steps per
    jitted dispatch (agents.make_train_scan; default 16 — each dispatch
    carries a fixed enqueue cost that is the same order as the work at
    the headline cadence, and the scan sweep measured 70.9/77.7/79.6/
    91.6M env-steps/s at K=8/16/32/64, BASELINE.md round-2 dispatch-
    amortization rows; BENCH_SCAN=1 falls back to one jit call per train
    step). Returns (env_steps_per_sec, info dict). D2H-synced by a
    metric read."""
    import time

    scan = max(int(os.environ.get("BENCH_SCAN", "16")), 1)
    n_calls = max(num_steps // rollout, 1)
    n_dispatch = max(n_calls // scan, 1)
    st = agent.init(0)
    if scan > 1:
        step = agent.make_train_scan(scan)
        sync = lambda m: float(m["reward_mean"][-1])  # noqa: E731
    else:
        step = agent.make_train_step()
        sync = lambda m: float(m["reward_mean"])  # noqa: E731
    st, m = step(st)
    _ = sync(m)  # D2H sync after compile
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(n_dispatch):
            st, m = step(st)
        _ = sync(m)
        best = min(best, time.perf_counter() - t0)
    rate = n_dispatch * scan * rollout * num_envs / best
    return rate, {"scan": scan, "n_dispatch": n_dispatch,
                  "best_s": round(best, 3)}


def bench_ddpg(num_envs: int, num_steps: int):
    """End-to-end DDPG actor-learner env-steps/s (VERDICT round-1 top
    item): full train_step = fused Pallas actor rollout + device replay
    insert + gradient updates, at a cadence validated to balance the
    pole (BASELINE.md round-2 learning table). Timing is synchronized by
    a device->host metric read (the tunneled platform's
    block_until_ready returns on enqueue)."""

    import jax

    from cartpoleplusplus_tpu import CartPole3D
    from cartpoleplusplus_tpu.agents import DDPG, DDPGConfig
    from cartpoleplusplus_tpu.physics.params import continuous_params

    rollout = int(os.environ.get("BENCH_DDPG_ROLLOUT", "64"))
    updates = int(os.environ.get("BENCH_DDPG_UPDATES", "8"))
    batch = int(os.environ.get("BENCH_DDPG_BATCH", "8192"))
    dtype = os.environ.get("BENCH_DDPG_DTYPE", "float32")
    # "updated" (default semantics) | "pre" (actor grad through the
    # pre-update critic: decouples the two backward passes per update).
    agc = os.environ.get("BENCH_DDPG_ACTOR_GRAD", "updated")
    # "per_update" (default) | "per_step" (one compounded polyak outside
    # the update scan).
    pol = os.environ.get("BENCH_DDPG_POLYAK", "per_update")
    # "auto" (default: the fused update-phase kernel on one TPU chip) |
    # "kernel" | "xla" — see DDPGConfig.learner.
    learner = os.environ.get("BENCH_DDPG_LEARNER", "auto")
    # in-kernel matmul precision for the fused learner ("bfloat16" | "")
    kprec = os.environ.get("BENCH_DDPG_KPREC") or None
    # Per-env replay ring length: the default 1024 slots x 42-f32 obs
    # is ~2.9 GB of HBM at 16384 envs — shrink it to bench very large
    # env counts (the sampling distribution changes, not the step cost).
    cap = int(os.environ.get("BENCH_DDPG_REPLAY", "1024"))
    env = CartPole3D(continuous_params(), num_envs=num_envs)
    agent = DDPG(env, DDPGConfig(rollout_steps=rollout,
                                 updates_per_step=updates,
                                 batch_size=batch, warmup_env_steps=0,
                                 dtype=dtype, actor_grad_critic=agc,
                                 polyak_cadence=pol, learner=learner,
                                 learner_precision=kprec,
                                 replay_capacity_per_env=cap))
    rate, info = _time_train(agent, rollout, num_envs, num_steps)
    target = 10_000_000.0
    print(json.dumps({
        "metric": f"ddpg_train_env_steps_per_sec_{num_envs}envs",
        "value": round(rate, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(rate / target, 4),
    }))
    print(json.dumps({"rollout_steps": rollout, "updates_per_step": updates,
                      "batch_size": batch, "dtype": dtype,
                      "actor_grad_critic": agc, "polyak_cadence": pol,
                      "fused": agent.fusable(),
                      "learner": learner,
                      "kernel_learner_ok": agent.kernel_learner_ok(),
                      **info}),
          file=sys.stderr)


def bench_dqn(num_envs: int, num_steps: int):
    """End-to-end DQN train env-steps/s: fused Pallas epsilon-greedy
    Q rollout + device replay insert + TD updates (the discrete config-2
    twin of bench_ddpg; same D2H-sync timing methodology)."""

    import jax  # noqa: F401 — backend init before agent build

    from cartpoleplusplus_tpu import CartPole3D, CartPoleParams
    from cartpoleplusplus_tpu.agents import DQN, DQNConfig

    learner = os.environ.get("BENCH_DQN_LEARNER", "auto")
    rollout = int(os.environ.get("BENCH_DQN_ROLLOUT", "64"))
    updates = int(os.environ.get("BENCH_DQN_UPDATES", "8"))
    batch = int(os.environ.get("BENCH_DQN_BATCH", "8192"))
    env = CartPole3D(CartPoleParams(), num_envs=num_envs)
    agent = DQN(env, DQNConfig(rollout_steps=rollout,
                               updates_per_step=updates,
                               batch_size=batch, warmup_env_steps=0,
                               learner=learner))
    rate, info = _time_train(agent, rollout, num_envs, num_steps)
    target = 10_000_000.0
    print(json.dumps({
        "metric": f"dqn_train_env_steps_per_sec_{num_envs}envs",
        "value": round(rate, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(rate / target, 4),
    }))
    print(json.dumps({"rollout_steps": rollout, "updates_per_step": updates,
                      "batch_size": batch,
                      "fused": agent.fusable(), **info}), file=sys.stderr)


def bench_naf(num_envs: int, num_steps: int):
    """End-to-end NAF actor-learner env-steps/s: fused mu-in-the-loop
    Pallas rollout + device replay insert + K quadratic-advantage TD
    updates (the fused update kernel under BENCH_NAF_LEARNER=kernel/auto,
    the XLA scan under =xla)."""

    import jax

    from cartpoleplusplus_tpu import CartPole3D
    from cartpoleplusplus_tpu.agents import NAF, NAFConfig
    from cartpoleplusplus_tpu.physics.params import continuous_params

    rollout = int(os.environ.get("BENCH_NAF_ROLLOUT", "64"))
    updates = int(os.environ.get("BENCH_NAF_UPDATES", "8"))
    batch = int(os.environ.get("BENCH_NAF_BATCH", "8192"))
    learner = os.environ.get("BENCH_NAF_LEARNER", "auto")
    precision = os.environ.get("BENCH_NAF_PRECISION", "") or None
    env = CartPole3D(continuous_params(), num_envs=num_envs)
    agent = NAF(env, NAFConfig(rollout_steps=rollout,
                               updates_per_step=updates,
                               batch_size=batch, warmup_env_steps=0,
                               learner=learner,
                               learner_precision=precision))
    rate, info = _time_train(agent, rollout, num_envs, num_steps)
    print(json.dumps({
        "metric": f"naf_train_env_steps_per_sec_{num_envs}envs",
        "value": round(rate, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(rate / 10_000_000.0, 4),
    }))
    print(json.dumps({"rollout_steps": rollout, "updates_per_step": updates,
                      "batch_size": batch, "learner": learner,
                      "learner_precision": precision,
                      "kernel_mode": agent.kernel_mode, **info}),
          file=sys.stderr)


def bench_lrpg(num_envs: int, num_steps: int):
    """End-to-end LRPG on-policy training env-steps/s: fused counter-
    Gumbel softmax-sampling Pallas rollout + returns-to-go + one policy
    update per window (no replay — the on-policy twin of the replay-
    agent benches; same D2H-sync timing)."""

    import jax  # noqa: F401 — backend init before agent build

    from cartpoleplusplus_tpu import CartPole3D, CartPoleParams
    from cartpoleplusplus_tpu.agents import LRPG, LRPGConfig

    rollout = int(os.environ.get("BENCH_LRPG_ROLLOUT", "32"))
    # "auto" (fused softmax-PG update kernel on one TPU chip) | "kernel"
    # | "xla" — see LRPGConfig.learner.
    learner = os.environ.get("BENCH_LRPG_LEARNER", "auto")
    env = CartPole3D(CartPoleParams(), num_envs=num_envs)
    agent = LRPG(env, LRPGConfig(rollout_steps=rollout, learner=learner))
    rate, info = _time_train(agent, rollout, num_envs, num_steps)
    print(json.dumps({
        "metric": f"lrpg_train_env_steps_per_sec_{num_envs}envs",
        "value": round(rate, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(rate / 10_000_000.0, 4),
    }))
    print(json.dumps({"rollout_steps": rollout, "learner": learner,
                      "kernel_learner_ok": agent.kernel_learner_ok(),
                      "fused": agent.fusable(), **info}), file=sys.stderr)


def bench_pixels(num_envs: int, num_steps: int):
    """Pixel-observation env throughput (BASELINE config 4): full
    env.step with 2-camera 48x48 rendering per action repeat. Batch and
    step count default smaller than the state bench (each env-step
    renders 6 frames). BENCH_PIXELS_DTYPE=bfloat16 selects the
    half-precision VPU ray-cast path."""
    from cartpoleplusplus_tpu import CartPole3D
    from cartpoleplusplus_tpu.bench import measure_env_steps_per_sec
    from cartpoleplusplus_tpu.env.pixels import RenderConfig
    from cartpoleplusplus_tpu.physics.params import continuous_params

    if "BENCH_NUM_ENVS" not in os.environ:
        num_envs = 1024
    if "BENCH_NUM_STEPS" not in os.environ:
        num_steps = 256
    dtype = os.environ.get("BENCH_PIXELS_DTYPE", "bfloat16")
    # BENCH_PIXELS_U8=1 quantizes observations to uint8 at obs-assembly
    # time (RenderConfig.obs_uint8): 4x less HBM traffic through the
    # stack/auto-reset-select pipeline downstream of the raycast.
    u8 = os.environ.get("BENCH_PIXELS_U8", "0") == "1"
    # BENCH_PIXELS_GRAY=1 benches the grayscale learning config (the
    # pixel-DDPG sweep winner): luminance composited inside the render
    # kernel, one output plane per camera instead of three.
    gray = os.environ.get("BENCH_PIXELS_GRAY", "0") == "1"
    env = CartPole3D(continuous_params(), num_envs=num_envs,
                     obs_mode="pixels",
                     render_config=RenderConfig(dtype=dtype, obs_uint8=u8,
                                                grayscale=gray))
    stats = measure_env_steps_per_sec(env, num_steps=num_steps, repeats=3)
    frames = (len(env.render_config.cameras)
              * env.params.action_repeats * stats["env_steps_per_sec"])
    print(json.dumps({
        "metric": f"pixel_env_steps_per_sec_{num_envs}envs",
        "value": round(stats["env_steps_per_sec"], 1),
        "unit": "env-steps/s",
        "vs_baseline": round(stats["env_steps_per_sec"] / 1_000_000.0, 4),
    }))
    rc = env.render_config
    print(json.dumps({"rendered_frames_per_sec": round(frames),
                      "num_envs": num_envs,
                      # Full render config, so suite numbers are
                      # self-describing (a 849k gray line and a 1.18M
                      # gray line must be distinguishable by config,
                      # not archaeology — VERDICT r4 weak #8).
                      "render": {"dtype": dtype, "obs_uint8": u8,
                                 "grayscale": gray,
                                 "width": rc.width, "height": rc.height,
                                 "cameras": len(rc.cameras),
                                 "frame_diff": rc.frame_diff},
                      **{k: stats[k] for k in
                         ("best_seconds", "num_steps")}}),
          file=sys.stderr)


def bench_ddpg_pixels(num_envs: int, num_steps: int):
    """END-TO-END pixel-DDPG training env-steps/s (BASELINE config 4 —
    VERDICT r3 item 3: the one config with no serious perf story).
    Defaults mirror `--preset pixels` (the measured >=190-eval recipe:
    512 envs, grayscale uint8 48x48 2-camera obs with gain-4 frame-diff,
    16 updates x 256 batch per 8-step rollout). Decomposition knobs:
    BENCH_PIX_UPDATES=0 isolates rollout+render+insert;
    BENCH_PIX_ROLLOUT / _BATCH / _ENVS / _DTYPE / _REPLAY probe the
    learner/batch/HBM axes. Same D2H-sync timing as every other bench."""
    import jax  # noqa: F401 — backend init before agent build

    from cartpoleplusplus_tpu import CartPole3D
    from cartpoleplusplus_tpu.agents import DDPG, DDPGConfig
    from cartpoleplusplus_tpu.env.pixels import RenderConfig
    from cartpoleplusplus_tpu.physics.params import continuous_params

    if "BENCH_NUM_ENVS" not in os.environ:
        num_envs = 512
    if "BENCH_NUM_STEPS" not in os.environ:
        num_steps = 1024
    rollout = int(os.environ.get("BENCH_PIX_ROLLOUT", "8"))
    updates = int(os.environ.get("BENCH_PIX_UPDATES", "16"))
    batch = int(os.environ.get("BENCH_PIX_BATCH", "256"))
    dtype = os.environ.get("BENCH_PIX_DTYPE", "float32")
    cap = int(os.environ.get("BENCH_PIX_REPLAY", "256"))
    pol = os.environ.get("BENCH_PIX_POLYAK", "per_update")
    agc = os.environ.get("BENCH_PIX_AGC", "updated")
    enc = os.environ.get("BENCH_PIX_ENCODER", "conv")
    smp = os.environ.get("BENCH_PIX_SAMPLE", "column")
    rcfg = RenderConfig(dtype="bfloat16", grayscale=True, obs_uint8=True,
                        frame_diff=True, frame_diff_gain=4.0)
    env = CartPole3D(continuous_params(), num_envs=num_envs,
                     obs_mode="pixels", render_config=rcfg)
    agent = DDPG(env, DDPGConfig(rollout_steps=rollout,
                                 updates_per_step=updates,
                                 batch_size=batch, warmup_env_steps=0,
                                 dtype=dtype, polyak_cadence=pol,
                                 actor_grad_critic=agc, encoder=enc,
                                 sample=smp,
                                 replay_capacity_per_env=cap))
    rate, info = _time_train(agent, rollout, num_envs, num_steps)
    print(json.dumps({
        "metric": f"pixel_ddpg_train_env_steps_per_sec_{num_envs}envs",
        "value": round(rate, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(rate / 1_000_000.0, 4),
    }), flush=True)
    print(json.dumps({"rollout_steps": rollout, "updates_per_step": updates,
                      "batch_size": batch, "dtype": dtype,
                      "replay_capacity_per_env": cap,
                      "polyak_cadence": pol, "actor_grad_critic": agc,
                      "encoder": enc, "sample": smp,
                      "num_envs": num_envs,
                      "render": {"dtype": rcfg.dtype,
                                 "obs_uint8": rcfg.obs_uint8,
                                 "grayscale": rcfg.grayscale,
                                 "width": rcfg.width,
                                 "height": rcfg.height,
                                 "cameras": len(rcfg.cameras),
                                 "frame_diff": rcfg.frame_diff,
                                 "frame_diff_gain": rcfg.frame_diff_gain},
                      "obs_shape": list(env.obs_shape), **info}),
          file=sys.stderr, flush=True)


def bench_suite():
    """`python bench.py --suite` (or BENCH_SUITE=1): the per-agent bench
    matrix as ONE durable artifact. Runs each config in a fresh
    subprocess (isolated jax state; a stall in one config can't sink the
    rest), collects every JSON line it prints, and writes
    BENCH_SUITE.json at the repo root — the driver-capturable/committed
    form of the per-agent numbers that previously lived only in
    BASELINE.md prose (VERDICT r3 item 8). Too heavy for the driver's
    400 s plain-`bench.py` budget (5+ independent kernel compiles), so
    the builder session runs it and commits the artifact;
    BENCH_SUITE_CONFIGS / BENCH_SUITE_TIMEOUT tune it."""
    import subprocess

    configs = os.environ.get(
        "BENCH_SUITE_CONFIGS",
        "discrete,ddpg,dqn,naf,lrpg,pixels,ddpg_pixels,ddpg_pixels_4096,"
        "ddpg_pixels_block_2048,ddpg_pixels_block_4096"
    ).split(",")
    # Suite aliases: a named BENCH_CONFIG plus baked env overrides —
    # for measured sweet spots whose knobs are env vars (BASELINE.md
    # round-4 pixel env-scaling row: 4096 envs / replay 32 is the peak
    # at the fixed quality-validated 16x256 update cadence; round-5
    # adds the block-sampling operating points — the *_block_* lines
    # are self-describing via the "sample" field).
    aliases = {"ddpg_pixels_4096": ("ddpg_pixels",
                                    {"BENCH_NUM_ENVS": "4096",
                                     "BENCH_NUM_STEPS": "1024",
                                     "BENCH_PIX_REPLAY": "32"}),
               "ddpg_pixels_block_2048": ("ddpg_pixels",
                                          {"BENCH_NUM_ENVS": "2048",
                                           "BENCH_NUM_STEPS": "1024",
                                           "BENCH_PIX_REPLAY": "64",
                                           "BENCH_PIX_SAMPLE": "block"}),
               "ddpg_pixels_block_4096": ("ddpg_pixels",
                                          {"BENCH_NUM_ENVS": "4096",
                                           "BENCH_NUM_STEPS": "1024",
                                           "BENCH_PIX_REPLAY": "32",
                                           "BENCH_PIX_SAMPLE": "block"})}
    per_timeout = float(os.environ.get("BENCH_SUITE_TIMEOUT", "900"))
    out = {"results": {}}
    for cfg in configs:
        cfg = cfg.strip()
        base, extra = aliases.get(cfg, (cfg, {}))
        env = dict(os.environ, BENCH_CONFIG=base, **extra)
        env.pop("BENCH_SUITE", None)
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True,
                timeout=per_timeout, cwd=os.path.dirname(
                    os.path.abspath(__file__)))
            lines = []
            for stream in (proc.stdout, proc.stderr):
                for ln in stream.splitlines():
                    ln = ln.strip()
                    if ln.startswith("{"):
                        try:
                            lines.append(json.loads(ln))
                        except ValueError:
                            pass
            out["results"][cfg] = {"rc": proc.returncode, "lines": lines,
                                   "seconds": round(
                                       time.perf_counter() - t0, 1)}
        except subprocess.TimeoutExpired:
            out["results"][cfg] = {"rc": "timeout",
                                   "seconds": round(per_timeout, 1)}
        headline = next((ln for ln in
                         out["results"][cfg].get("lines", [])
                         if "metric" in ln), None)
        print(json.dumps({"config": cfg, **(headline or
                          {"error": out["results"][cfg]["rc"]})}),
              flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_SUITE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
