#!/bin/bash
# Round-2 TPU batch 6 (serialized):
# 1. DQN fused train bench (Mosaic uint32->f32 cast fixed in the kernel)
# 2. pixel-DDPG long checkpointed run at the sweep winner (grayscale, lr 3e-4)
# 3. eval-only from that pixel checkpoint (VERDICT #2 done-criterion)
cd /root/repo
echo "=== DQN fused train bench (4096 envs)"
BENCH_CONFIG=dqn timeout 1800 python bench.py 2>&1 | tail -3
echo "=== pixel-DDPG long run (grayscale 48, lr 3e-4, ckpt)"
timeout 3600 python -u -m cartpoleplusplus_tpu.train --agent ddpg \
  --obs-mode pixels --render-grayscale --num-envs 512 \
  --total-env-steps 60000 --ddpg.replay-capacity-per-env 256 \
  --ddpg.updates-per-step 8 --ddpg.ou-sigma-decay-env-steps 20000 \
  --ddpg.actor-lr 3e-4 --log-interval 5000 \
  --ckpt-dir .runs/ddpg_px --no-ckpt-full \
  --final-eval --eval-steps 400 2>/dev/null | tail -6
echo "=== eval-only from the pixel checkpoint"
timeout 2400 python -u -m cartpoleplusplus_tpu.train --agent ddpg \
  --obs-mode pixels --render-grayscale --num-envs 512 \
  --ddpg.replay-capacity-per-env 256 --ddpg.actor-lr 3e-4 \
  --ckpt-dir .runs/ddpg_px --eval-only --eval-steps 600 2>/dev/null | tail -3
echo "=== batch6 done"
