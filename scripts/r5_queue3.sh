#!/bin/bash
# Round-5 queue, stage 3 (session resume after the snapshot): the new
# centralized-student study first (this session's science), then every
# results artifact PARITY.md cites that is still missing from the repo
# (VERDICT r4 item 2), headline citations first, the long dyna regens
# last.  Waits for a running bench (writes "bench rc=" to $BENCH_LOG)
# before touching the TPU.
# Usage: bash scripts/r5_queue3.sh [start_index] [bench_log_to_wait_on]
cd "$(dirname "$0")/.." || exit 1
RUN="python scripts/run_study.py"
LOG=/tmp/r5_queue3.log
START=${1:-0}
BENCH_LOG=${2:-}

if [ -n "$BENCH_LOG" ]; then
  # bounded wait: if the bench dies without writing its rc marker, start
  # anyway after 90 min rather than idling the TPU forever
  WAITED=0
  while ! grep -q "bench rc=" "$BENCH_LOG" 2>/dev/null; do
    if [ "$WAITED" -ge 5400 ]; then
      echo "=== bench marker never appeared in $BENCH_LOG after ${WAITED}s; starting queue" | tee -a "$LOG"
      break
    fi
    sleep 30; WAITED=$((WAITED + 30))
  done
fi

declare -a JOBS=(
  "results/r5/centralized_student.json -- python scripts/centralized_student_study.py 32 128 4 256 1000"
  "results/r4/dreamer_iteration.json -- python scripts/dreamer_iteration_study.py 32 128 4 256 1500"
  "results/r4/teacher_consistency.json -- python scripts/teacher_consistency_probe.py 64"
  "results/r4/mpc_sticky.json -- python scripts/mpc_sticky_study.py 32 128 4 75"
  "results/r4/actor_critic.json -- python scripts/actor_critic_study.py 32 128 4 256 1500"
  "results/r4/behavior_adversary.json -- python scripts/behavior_adversary_study.py 64 2 256"
  "results/r4/behavior_spread.json -- python scripts/behavior_spread_study.py 64 2 256"
  "results/r4/reward_head.json -- python scripts/reward_head_study.py 32 128 4 256"
  "results/r4/unroll_rescue.json -- python scripts/unroll_rescue_study.py 256"
  "results/r4/unroll_push.json -- python scripts/unroll_push_study.py 256"
  "results/r4/mpc_study.json -- python scripts/mpc_study.py 32 128"
  "results/r4/distill_policy_w256.json -- python scripts/distill_study.py 32 128 4 256 1000 256"
  "results/r4/dyna_recipe_wm.json -- python scripts/dyna_study.py 16 256 1"
  "results/r4/dyna_sticky_wm.json -- python scripts/dyna_study.py 16 256 2"
)

for i in "${!JOBS[@]}"; do
  if [ "$i" -lt "$START" ]; then continue; fi
  echo "=== [$(date +%H:%M:%S)] r5c job $i: ${JOBS[$i]}" | tee -a "$LOG"
  # shellcheck disable=SC2086
  $RUN ${JOBS[$i]} >>"$LOG" 2>&1 || echo "=== r5c job $i FAILED (rc=$?)" | tee -a "$LOG"
done
echo "=== [$(date +%H:%M:%S)] r5c queue done" | tee -a "$LOG"
