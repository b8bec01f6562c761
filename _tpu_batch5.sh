#!/bin/bash
# Round-2 TPU batch 5 (serialized; supersedes batch3 C and batch4):
# 1. D rerun: push eval-200 at the 4096-env high-throughput cadence
# 2. pixel-DDPG sweeps with HBM-sane replay (512 envs x 256 slots uint8)
# 3. fused-DQN train bench, pixel uint8-obs benches, LRPG fused run
# 4. headline bench with the new on-hardware kernel parity check
cd /root/repo
echo "=== D rerun: 4096 envs, 640k steps, slow decay (push to 200)"
timeout 2400 python -u -m cartpoleplusplus_tpu.train --agent ddpg --num-envs 4096 \
  --total-env-steps 640000 --ddpg.rollout-steps 64 --ddpg.updates-per-step 8 \
  --ddpg.batch-size 8192 --ddpg.ou-sigma-decay-env-steps 200000 \
  --final-eval --eval-steps 600 --log-interval 2000 2>/dev/null | tail -4
echo "=== C1: pixel-DDPG sweep (RGB 48, replay 256)"
timeout 4000 python -u -m cartpoleplusplus_tpu.sweep --out /tmp/sweep_px2.jsonl \
  --base "--agent ddpg --obs-mode pixels --num-envs 512 --total-env-steps 30000 --ddpg.replay-capacity-per-env 256 --ddpg.updates-per-step 8 --ddpg.ou-sigma-decay-env-steps 10000 --log-interval 100000 --final-eval --eval-steps 400" \
  --grid ddpg.actor-lr=1e-4,3e-4 2>&1 | tail -3
echo "=== C2: pixel-DDPG sweep (grayscale 48, replay 256)"
timeout 4000 python -u -m cartpoleplusplus_tpu.sweep --out /tmp/sweep_px2.jsonl \
  --base "--agent ddpg --obs-mode pixels --render-grayscale --num-envs 512 --total-env-steps 30000 --ddpg.replay-capacity-per-env 256 --ddpg.updates-per-step 8 --ddpg.ou-sigma-decay-env-steps 10000 --log-interval 100000 --final-eval --eval-steps 400" \
  --grid ddpg.actor-lr=1e-4,3e-4 2>&1 | tail -3
echo "=== DQN fused train bench (4096 envs)"
BENCH_CONFIG=dqn timeout 1800 python bench.py 2>&1 | tail -3
echo "=== pixel bench: uint8 obs OFF (baseline)"
BENCH_CONFIG=pixels timeout 1200 python bench.py 2>&1 | tail -3
echo "=== pixel bench: uint8 obs ON"
BENCH_CONFIG=pixels BENCH_PIXELS_U8=1 timeout 1200 python bench.py 2>&1 | tail -3
echo "=== LRPG fused run (counter-Gumbel sampler): learning + throughput"
timeout 1800 python -u -m cartpoleplusplus_tpu.train --agent lrpg --num-envs 2048 \
  --total-env-steps 60000 --final-eval --eval-steps 400 --log-interval 400 \
  2>/dev/null | tail -4
echo "=== headline bench + hw parity"
timeout 1200 python bench.py 2>&1 | tail -3
echo "=== batch5 done"
