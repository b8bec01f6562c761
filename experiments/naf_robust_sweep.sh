#!/bin/bash
# Round-5 (VERDICT r4 item 4): search for an ARITHMETIC-ROBUST NAF
# recipe — one that solves under the kernel's default Mosaic dot
# lowering AND the XLA learner, so NAFConfig can return to
# learner="auto" with zero canary restarts. Lever intuition from the
# round-4 closure (docs/design.md §16): the collapse basin is entered
# through the unconstrained Cholesky head's curvature growth — widen
# the basin with lower lr / tighter grad clip / longer decay, rather
# than re-drawing lottery tickets.
# Usage: bash experiments/naf_robust_sweep.sh screen|confirm <cellargs...>
set -u
MODE="${1:-screen}"
run_cell() {  # name seed learner extra-args...
  local name="$1" seed="$2" learner="$3"; shift 3
  echo "=== $name seed=$seed learner=$learner $* ==="
  timeout 580 python -m cartpoleplusplus_tpu.train --agent naf \
    --num-envs 1024 --total-env-steps 80000 --seed "$seed" \
    --naf.learner "$learner" --final-eval --log-interval 40000 "$@" 2>&1 \
    | grep -E "final_eval|eval_mean|Traceback|Error" | tail -2
}
if [ "$MODE" = screen ]; then
  # Screen candidates on the two measured-hard cells (seed 0 was the
  # round-3/4 collapse cell at 80k; seed 2 needed 5 canary restarts).
  for SEED in 0 2; do
    run_cell A "$SEED" kernel --naf.lr 2e-4
    run_cell B "$SEED" kernel --naf.max-grad-norm 3
    run_cell C "$SEED" kernel --naf.lr 2e-4 --naf.max-grad-norm 3
    run_cell D "$SEED" kernel --naf.lr 3e-4 --naf.lr-decay-env-steps 60000 --naf.max-grad-norm 5
  done
else
  # Confirm: winner cell x seeds 0-3 x both learners.
  shift || true
  for SEED in 0 1 2 3; do
    for L in kernel xla; do
      run_cell WINNER "$SEED" "$L" "$@"
    done
  done
fi
