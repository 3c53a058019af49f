#!/bin/bash
# Round-5 queue, stage 2 (after the action_delta breakthrough): the
# control-WM distillation leg jumps the line, then the remaining VERDICT
# priority regens, then the round-5 studies, then low-priority regens.
# Usage: bash scripts/r5_queue2.sh [start_index] [wait_pid]
cd "$(dirname "$0")/.." || exit 1
RUN="python scripts/run_study.py"
LOG=/tmp/r5_queue.log
START=${1:-0}
WAIT_PID=${2:-}

if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

declare -a JOBS=(
  "results/r5/distill_control.json -- python scripts/distill_study.py 32 128 4 256 1000 128 1"
  "results/r4/distill_seed_ci.json -- python scripts/distill_seed_ci.py 4 1500 32 128 4"
  "results/r4/reward_oracle.json -- python scripts/reward_oracle_probe.py 256"
  "results/r4/unroll_study.json -- python scripts/unroll_study.py 256"
  "results/r4/dreamer_iteration.json -- python scripts/dreamer_iteration_study.py 32 128 4 256 1500"
  "results/r5/dreamer_loop.json -- python scripts/dreamer_loop_study.py 3 32 128 4 256 1500"
  "results/r5/selfplay.json -- python scripts/selfplay_study.py 32 128 4 256 4 400"
  "results/r5/generalist.json -- python scripts/generalist_study.py 256"
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
  echo "=== [$(date +%H:%M:%S)] r5b job $i: ${JOBS[$i]}" | tee -a "$LOG"
  # shellcheck disable=SC2086
  $RUN ${JOBS[$i]} >>"$LOG" 2>&1 || echo "=== r5b job $i FAILED (rc=$?)" | tee -a "$LOG"
done
echo "=== [$(date +%H:%M:%S)] r5b queue done" | tee -a "$LOG"
