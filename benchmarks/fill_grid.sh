#!/bin/bash
# Fill the task x algo benchmark grid (reference protocol: 7 Bullet-analog
# tasks x 7 algorithms, docs/tutorials/benchmark.rst). Runs sequentially so
# only one job owns the TPU at a time. Skips cells that already have results.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=benchmarks/results

run_cell() {
  local task=$1 algo=$2 limit=$3
  if ls "$OUT/$task-$algo"-s0.json >/dev/null 2>&1; then
    echo "skip $task/$algo (exists)"
    return
  fi
  echo "=== $task / $algo (cost_limit=$limit) ==="
  timeout 1200 python benchmarks/run_curves.py \
    --task "$task" --algos "$algo" --seeds 0 --cost_limit "$limit" \
    --outdir "$OUT" || echo "FAILED: $task/$algo"
}

# on-policy first (fast), then off-policy
for task in SafetyCarCircle-v0 SafetyCarRun-v0; do
  for algo in ppol trpol cpo focops ddpgl sacl cvpo; do
    run_cell "$task" "$algo" 10.0
  done
done
for task in SafetyDroneRun-v0 SafetyDroneCircle-v0 SafetyAntRun-v0 SafetyAntCircle-v0; do
  for algo in ppol trpol cpo focops ddpgl sacl cvpo; do
    run_cell "$task" "$algo" 25.0
  done
done
echo "grid fill complete"
