#!/usr/bin/env python
"""Device-side hlo_stats trace of the pixel-DDPG train step (round-4/5
diagnosis tool). Runs N profiled train calls at a given config, converts
the xplane capture with xprof, and prints the top ops by total device
time — tunnel-independent numbers (CLAUDE.md: wall timings here include
a 15-50 ms round-trip; device op times do not).

Usage: python experiments/pixel_trace.py [--envs 2048] [--replay 64]
           [--calls 32] [--out /tmp/px_prof] [--top 25]
"""

import argparse
import glob
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=2048)
    ap.add_argument("--replay", type=int, default=64)
    ap.add_argument("--updates", type=int, default=16)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--calls", type=int, default=32)
    ap.add_argument("--scan", type=int, default=16)
    ap.add_argument("--sample", default="column")
    ap.add_argument("--out", default="/tmp/px_prof")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax

    from cartpoleplusplus_tpu import CartPole3D
    from cartpoleplusplus_tpu.agents import DDPG, DDPGConfig
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
                                 warmup_env_steps=0, sample=args.sample,
                                 replay_capacity_per_env=args.replay))
    st = agent.init(0)
    scan = agent.make_train_scan(args.scan)
    st, m = scan(st)          # warm the compile + fill some replay
    _ = float(m["reward_mean"][-1])

    shutil.rmtree(args.out, ignore_errors=True)
    jax.profiler.start_trace(args.out)
    for _ in range(max(args.calls // args.scan, 1)):
        st, m = scan(st)
    _ = float(m["reward_mean"][-1])
    jax.profiler.stop_trace()

    from xprof.convert import raw_to_tool_data as r
    files = glob.glob(os.path.join(args.out,
                                   "plugins/profile/*/*.xplane.pb"))
    data, _mime = r.xspace_to_tool_data(files, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    # Google DataTable JSON: {"cols": [{"id": ...}], "rows": [{"c": [...]}]}
    table = json.loads(data)
    ids = [c["id"] for c in table["cols"]]
    rows = [{i: (cell or {}).get("v") for i, cell in zip(ids, row["c"])}
            for row in table["rows"]]
    n_steps = max(args.calls // args.scan, 1) * args.scan

    parsed = []
    for row in rows:
        t = row.get("total_self_time") or row.get("total_time")
        name = row.get("hlo_op_expression") or row.get("hlo_op_name")
        cat = row.get("category")
        if t is None:
            continue
        try:
            t = float(str(t).replace(",", ""))
        except ValueError:
            continue
        parsed.append((t, cat, (name or "")[:110]))
    parsed.sort(reverse=True)
    total = sum(t for t, _, _ in parsed)
    print(f"# {n_steps} train calls, total device {total/1e3:.1f} ms, "
          f"{total/n_steps:.0f} us/call")
    print(f"{'us/call':>9}  {'category':<22} op")
    for t, cat, name in parsed[:args.top]:
        print(f"{t/n_steps:9.0f}  {str(cat):<22} {name}")
    # Category rollup
    by_cat = {}
    for t, cat, _ in parsed:
        by_cat[cat] = by_cat.get(cat, 0.0) + t
    print("\n# by category (us/call)")
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{t/n_steps:9.0f}  {cat}")


if __name__ == "__main__":
    main()
