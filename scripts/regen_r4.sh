#!/bin/bash
# Regenerate the round-4 study artifacts lost to the mid-round machine
# restart (VERDICT r4 item 2).  Sequential — one TPU chip; ordered so
# shared world-model checkpoints (train_sticky tags under /tmp/ck_*,
# resume=true) train once and early items are the VERDICT priority list.
# Each study's stdout JSON is persisted by scripts/run_study.py to the
# exact results/r4 path PARITY.md cites.
#
# Usage: bash scripts/regen_r4.sh [start_index]
cd "$(dirname "$0")/.." || exit 1
RUN="python scripts/run_study.py"
LOG=/tmp/regen_r4.log
START=${1:-0}

declare -a JOBS=(
  "results/r4/sticky_study.json -- python scripts/sticky_study.py 256"
  "results/r4/action_sensitivity.json -- python scripts/regen_action_sensitivity.py 256"
  "results/r4/mpc_sticky90.json -- python scripts/mpc_sticky_study.py 32 128 4 90"
  "results/r4/imagination_policy.json -- python scripts/imagination_policy_study.py 32 128 4 256 1500"
  "results/r4/distill_policy.json -- python scripts/distill_study.py 32 128 4 256 1000 128"
  "results/r4/distill_seed_ci.json -- python scripts/distill_seed_ci.py 4 1500 32 128 4"
  "results/r4/reward_oracle.json -- python scripts/reward_oracle_probe.py 256"
  "results/r4/unroll_study.json -- python scripts/unroll_study.py 256"
  "results/r4/dreamer_iteration.json -- python scripts/dreamer_iteration_study.py 32 128 4 256 1500"
  "results/r4/mpc_sticky.json -- python scripts/mpc_sticky_study.py 32 128 4 75"
  "results/r4/teacher_consistency.json -- python scripts/teacher_consistency_probe.py 64"
  "results/r4/actor_critic.json -- python scripts/actor_critic_study.py 32 128 4 256 1500"
  "results/r4/behavior_adversary.json -- python scripts/behavior_adversary_study.py 64 2 256"
  "results/r4/behavior_spread.json -- python scripts/behavior_spread_study.py 64 2 256"
  "results/r4/unroll_rescue.json -- python scripts/unroll_rescue_study.py 256"
  "results/r4/unroll_push.json -- python scripts/unroll_push_study.py 256"
  "results/r4/reward_head.json -- python scripts/reward_head_study.py 32 128 4 256"
  "results/r4/mpc_study.json -- python scripts/mpc_study.py 32 128"
  "results/r4/distill_policy_w256.json -- python scripts/distill_study.py 32 128 4 256 1000 256"
  "results/r4/dyna_recipe_wm.json -- python scripts/dyna_study.py 16 256 1"
  "results/r4/dyna_sticky_wm.json -- python scripts/dyna_study.py 16 256 2"
)

for i in "${!JOBS[@]}"; do
  if [ "$i" -lt "$START" ]; then continue; fi
  echo "=== [$(date +%H:%M:%S)] job $i: ${JOBS[$i]}" | tee -a "$LOG"
  # shellcheck disable=SC2086
  $RUN ${JOBS[$i]} >>"$LOG" 2>&1 || echo "=== job $i FAILED (rc=$?)" | tee -a "$LOG"
done
echo "=== [$(date +%H:%M:%S)] regen queue done" | tee -a "$LOG"
