#!/bin/bash
# NAF fused-kernel quality matrix at an explicit in-kernel matmul
# precision (follow-up to experiments/naf_kernel_drift.py: the default
# Mosaic f32 dot lowering carries a systematic accumulation bias,
# exponent 1.31; 'highest' collapses it to random-walk 0.38).
# Usage: bash experiments/naf_kernel_quality.sh [precision]
set -u
PREC="${1:-highest}"
if [ -z "${SKIP_CONTROL:-}" ]; then
  echo "=== control: kernel=$PREC twin=$PREC drift leg ==="
  timeout 580 python experiments/naf_kernel_drift.py --segments 16 \
    --kernel-precision "$PREC" --twin-precision "$PREC" 2>&1 | tail -3
fi
for STEPS in 40000 80000; do
  for SEED in 0 1; do
    echo "=== naf kernel prec=$PREC steps=$STEPS seed=$SEED ==="
    timeout 580 python -m cartpoleplusplus_tpu.train --agent naf \
      --num-envs 1024 --total-env-steps "$STEPS" --seed "$SEED" \
      --naf.learner kernel --naf.learner-precision "$PREC" \
      --final-eval --log-interval 20000 2>&1 \
      | grep -E "eval_|Traceback|Error" | tail -3
  done
done
