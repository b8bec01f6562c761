#!/bin/bash
cd /root/repo
echo "=== D: 4096-env fast cadence, default lr, 640k steps, slow decay"
timeout 2400 python -m cartpoleplusplus_tpu.train --agent ddpg --num-envs 4096 \
  --total-env-steps 640000 --ddpg.rollout-steps 64 --ddpg.updates-per-step 8 \
  --ddpg.batch-size 8192 --ddpg.ou-sigma-decay-env-steps 200000 \
  --final-eval --eval-steps 600 --log-interval 4000 2>/dev/null | tail -3
echo "=== C1: pixel-DDPG sweep (RGB 48)"
timeout 4000 python -m cartpoleplusplus_tpu.sweep --out /tmp/sweep_px1.jsonl \
  --base "--agent ddpg --obs-mode pixels --num-envs 512 --total-env-steps 30000 --log-interval 100000 --final-eval --eval-steps 400" \
  --grid ddpg.actor-lr=1e-4,3e-4 2>&1 | tail -3
echo "=== C2: pixel-DDPG sweep (grayscale 48)"
timeout 4000 python -m cartpoleplusplus_tpu.sweep --out /tmp/sweep_px1.jsonl \
  --base "--agent ddpg --obs-mode pixels --render-grayscale --num-envs 512 --total-env-steps 30000 --log-interval 100000 --final-eval --eval-steps 400" \
  --grid ddpg.actor-lr=1e-4,3e-4 2>&1 | tail -3
