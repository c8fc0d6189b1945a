#!/bin/bash
# Second pass: re-run cells recorded before the off-policy stability fixes
# (bounded alpha, entropy-free cost targets, fresh-data PID steps, staggered
# episode clocks) and extend coverage to the navigation suite.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=benchmarks/results

run_cell() {
  local task=$1 algo=$2 limit=$3
  echo "=== $task / $algo (cost_limit=$limit) ==="
  timeout 1200 python benchmarks/run_curves.py \
    --task "$task" --algos "$algo" --seeds 0 --cost_limit "$limit" \
    --outdir "$OUT" || echo "FAILED: $task/$algo"
}

# stale off-policy circle cells (pre-fix results showed the instability)
for algo in sacl ddpgl; do
  run_cell SafetyBallCircle-v0 "$algo" 25.0
  run_cell SafetyCarCircle-v0 "$algo" 10.0
done
# pre-fix on-policy circle cells that sat above the limit
run_cell SafetyBallCircle-v0 cpo 25.0
run_cell SafetyBallCircle-v0 ppol 25.0

# navigation suite coverage (reference benchmarks 6 navigation tasks)
for task in SafetyPointGoal1-v0 SafetyPointGoal2-v0 SafetyPointButton1-v0 SafetyPointPush1-v0; do
  for algo in ppol cpo; do
    if ls "$OUT/$task-$algo"-s0.json >/dev/null 2>&1; then
      echo "skip $task/$algo (exists)"; continue
    fi
    run_cell "$task" "$algo" 25.0
  done
done
echo "second pass complete"
