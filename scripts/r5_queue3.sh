#!/bin/bash
# Round-5 queue, stage 3 (final): the four round-5 studies first
# (dreamer loop = VERDICT item 3, control-loop last mile, self-play =
# item 8, generalist = item 9), then the dreamer_iteration regen (cheap
# after dreamer_loop warms /tmp/dreamer_iter), then remaining regens.
# A deadline guard stops launching new jobs late in the round so the
# TPU is free for the round-end bench run.
# Usage: bash scripts/r5_queue3.sh [start_index] [wait_pid] [deadline_ts]
cd "$(dirname "$0")/.." || exit 1
RUN="python scripts/run_study.py"
LOG=/tmp/r5_queue.log
START=${1:-0}
WAIT_PID=${2:-}
DEADLINE=${3:-0}

if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

declare -a JOBS=(
  "results/r5/dreamer_loop.json -- python scripts/dreamer_loop_study.py 3 32 128 4 256 1500"
  "results/r5/control_loop.json -- python scripts/control_loop_study.py 32 128 4 256 3000 256"
  "results/r5/selfplay.json -- python scripts/selfplay_study.py 32 128 4 256 4 400"
  "results/r5/generalist.json -- python scripts/generalist_study.py 256"
  "results/r4/dreamer_iteration.json -- python scripts/dreamer_iteration_study.py 32 128 4 256 1500"
  "results/r4/teacher_consistency.json -- python scripts/teacher_consistency_probe.py 64"
  "results/r4/mpc_study.json -- python scripts/mpc_study.py 32 128"
  "results/r4/mpc_sticky.json -- python scripts/mpc_sticky_study.py 32 128 4 75"
  "results/r4/actor_critic.json -- python scripts/actor_critic_study.py 32 128 4 256 1500"
  "results/r4/behavior_adversary.json -- python scripts/behavior_adversary_study.py 64 2 256"
  "results/r4/behavior_spread.json -- python scripts/behavior_spread_study.py 64 2 256"
  "results/r4/unroll_rescue.json -- python scripts/unroll_rescue_study.py 256"
  "results/r4/unroll_push.json -- python scripts/unroll_push_study.py 256"
  "results/r4/reward_head.json -- python scripts/reward_head_study.py 32 128 4 256"
  "results/r4/dyna_recipe_wm.json -- python scripts/dyna_study.py 16 256 1"
  "results/r4/dyna_sticky_wm.json -- python scripts/dyna_study.py 16 256 2"
)

for i in "${!JOBS[@]}"; do
  if [ "$i" -lt "$START" ]; then continue; fi
  if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "=== [$(date +%H:%M:%S)] r5c deadline reached, stopping before job $i" | tee -a "$LOG"
    break
  fi
  echo "=== [$(date +%H:%M:%S)] r5c job $i: ${JOBS[$i]}" | tee -a "$LOG"
  # shellcheck disable=SC2086
  $RUN ${JOBS[$i]} >>"$LOG" 2>&1 || echo "=== r5c job $i FAILED (rc=$?)" | tee -a "$LOG"
done
echo "=== [$(date +%H:%M:%S)] r5c queue done" | tee -a "$LOG"
