#!/bin/bash
# Serialized TPU jobs: high-throughput cadence balancing + pixel sweep.
cd /root/repo
echo "=== A: 4096-env fast cadence, lr x3, 200k steps"
timeout 2400 python -m cartpoleplusplus_tpu.train --agent ddpg --num-envs 4096 \
  --total-env-steps 200000 --ddpg.rollout-steps 64 --ddpg.updates-per-step 8 \
  --ddpg.batch-size 8192 --ddpg.actor-lr 3e-4 --ddpg.critic-lr 3e-3 \
  --ddpg.ou-sigma-decay-env-steps 60000 \
  --final-eval --eval-steps 600 --log-interval 1000 2>/dev/null | tail -3
echo "=== B: 4096-env fast cadence, default lr, 320k steps"
timeout 2400 python -m cartpoleplusplus_tpu.train --agent ddpg --num-envs 4096 \
  --total-env-steps 320000 --ddpg.rollout-steps 64 --ddpg.updates-per-step 8 \
  --ddpg.batch-size 8192 --ddpg.ou-sigma-decay-env-steps 100000 \
  --final-eval --eval-steps 600 --log-interval 2000 2>/dev/null | tail -3
echo "=== C: pixel-DDPG sweep"
timeout 7000 python -m cartpoleplusplus_tpu.sweep --out /tmp/sweep_px1.jsonl \
  --base "--agent ddpg --obs-mode pixels --num-envs 512 --total-env-steps 30000 --log-interval 100000 --final-eval --eval-steps 400" \
  --grid render-grayscale=False,True \
  --grid ddpg.actor-lr=1e-4,3e-4 2>&1 | tail -6
