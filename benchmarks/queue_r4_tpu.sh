#!/bin/bash
# Round-4 TPU queue. Runs AFTER the round-3 queue (queue_r3b) exits:
#  1. re-run every sacl seed whose committed final cost diverged (>2x limit)
#     under the hardened controller (filtered PID + nonneg cost targets +
#     pessimistic cost heads) — verdict ask #1;
#  2. re-run the cvpo nav cells with no feasible checkpoint (PID backstop
#     dual + pessimistic cost heads) — verdict ask #2;
#  3. seed fills for the fidelity rows quoted at n<3 — verdict ask #7.
#
# Process hygiene (verdict weak #5): each cell is committed to git as it
# lands, and no new cell starts after DEADLINE so the driver's bench owns
# the TPU at round end. Resumable: re-run cells are deleted up front, so
# the existence check naturally skips completed work.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
OUT=benchmarks/results_1m
DEADLINE=${DEADLINE:-$(( $(date +%s) + 18000 ))}   # default: +5h

# wait for the round-3 queue to release the TPU tunnel
while pgrep -f "bash benchmarks/queue_r3b.sh" >/dev/null 2>&1; do
  sleep 60
done

commit_results() {
  python benchmarks/make_summaries.py --dirs "$OUT" >/dev/null 2>&1
  python benchmarks/nav_fidelity.py >/dev/null 2>&1
  python benchmarks/env_fidelity.py >/dev/null 2>&1
  for i in 1 2 3; do
    git add "$OUT" docs/nav_fidelity.md docs/env_fidelity.md 2>/dev/null && \
      git commit -q -m "results: $1 (r4 queue)" && break
    sleep 5   # index.lock contention with the interactive session
  done
}

run_cell() {  # task algo seeds budget_flag budget [extra args...]
  local task=$1 algo=$2 seeds=$3 bflag=$4 budget=$5; shift 5
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "deadline reached, skipping $task/$algo"
    return
  fi
  local missing=""
  for s in ${seeds//,/ }; do
    [ -f "$OUT/$task-$algo-s$s.json" ] || missing="$missing,$s"
  done
  missing="${missing#,}"
  [ -z "$missing" ] && { echo "skip $task/$algo (exists)"; return; }
  echo "=== $task / $algo / seeds $missing ==="
  timeout 4200 python benchmarks/run_curves.py \
    --task "$task" --algos "$algo" --seeds "$missing" --cost_limit 25.0 \
    "$bflag" "$budget" --outdir "$OUT" "$@" \
    || { echo "FAILED: $task/$algo"; return; }
  commit_results "$task/$algo s$missing"
}

# ---- phase 1: diverged sacl seeds (hardened controller) ----
for f in \
  "SafetyBallRun-v0 sacl 0 --off_budget 300000" \
  "SafetyCarRun-v0 sacl 0,2 --off_budget 300000" \
  "SafetyAntRun-v0 sacl 2 --off_budget 300000" \
  "SafetyDroneCircle-v0 sacl 1,2 --off_budget 300000" \
  "SafetyAntCircle-v0 sacl 0 --off_budget 500000" \
  ; do
  set -- $f
  marker="$OUT/.r4_rerun_$1_$2"
  if [ ! -f "$marker" ] && [ "$(date +%s)" -lt "$DEADLINE" ]; then
    for s in ${3//,/ }; do rm -f "$OUT/$1-$2-s$s.json"; done
    touch "$marker"
  fi
  run_cell "$1" "$2" "$3" "$4" "$5"
done

# ---- phase 2: nav off-policy re-runs (sacl diverged finals + cvpo
#      infeasible bests) ----
for f in \
  "SafetyPointButton1-v0 sacl 0,1,2 --off_budget 500000" \
  "SafetyPointButton2-v0 sacl 1,2 --off_budget 500000" \
  "SafetyPointPush2-v0 sacl 0 --off_budget 500000" \
  "SafetyPointButton1-v0 cvpo 0,1,2 --off_budget 500000" \
  "SafetyPointButton2-v0 cvpo 0,1,2 --off_budget 500000" \
  "SafetyPointGoal2-v0 cvpo 0,1,2 --off_budget 500000" \
  "SafetyPointPush2-v0 cvpo 0,1,2 --off_budget 500000" \
  "SafetyPointPush1-v0 cvpo 1 --off_budget 500000" \
  ; do
  set -- $f
  marker="$OUT/.r4_rerun_$1_$2"
  if [ ! -f "$marker" ] && [ "$(date +%s)" -lt "$DEADLINE" ]; then
    for s in ${3//,/ }; do rm -f "$OUT/$1-$2-s$s.json"; done
    touch "$marker"
  fi
  run_cell "$1" "$2" "$3" "$4" "$5"
done

# ---- phase 3: n=3 fills for quoted fidelity rows (ask #7) ----
run_cell SafetyAntRun-v0 ppol 0,1,2 --budget 2000000
run_cell SafetyAntRun-v0 cpo 0,1,2 --budget 2000000
run_cell SafetyAntRun-v0 focops 0,1,2 --budget 2000000
run_cell SafetyAntRun-v0 trpol 0,1,2 --budget 2000000
run_cell SafetyAntCircle-v0 trpol 0,1,2 --budget 2000000
run_cell SafetyBallCircle-v0 cvpo 0,1,2 --off_budget 300000
run_cell SafetyBallCircle-v0 sacl 0,1,2 --off_budget 300000
run_cell SafetyBallCircle-v0 ddpgl 0,1,2 --off_budget 300000

echo "queue_r4_tpu complete"
