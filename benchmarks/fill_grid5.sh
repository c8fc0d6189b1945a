#!/bin/bash
# Fifth pass: the FULL navigation grid — all 7 algorithms x 6 Safety-
# Gymnasium-analog navigation tasks (PointGoal1/2, PointButton1/2,
# PointPush1/2; reference protocol docs/tutorials/benchmark.rst:81-113) x 3
# seeds at the 1M on-policy / 500k off-policy protocol. Round-2 verdict gap:
# off-policy had zero navigation cells and the "2" trio was near-empty.
# Seed 0 first across every empty cell (coverage beats seed depth), then
# seeds 1,2. sacl runs last in each phase so the PID-stability retune lands
# before its cells execute. Resumable: existing cells are skipped.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=benchmarks/results_1m

run_cell() {
  local task=$1 algo=$2 seed=$3
  if ls "$OUT/$task-$algo-s$seed.json" >/dev/null 2>&1; then
    echo "skip $task/$algo/s$seed (exists)"
    return
  fi
  echo "=== $task / $algo / seed $seed ==="
  timeout 1800 python benchmarks/run_curves.py \
    --task "$task" --algos "$algo" --seeds "$seed" --cost_limit 25.0 \
    --budget 1000000 --off_budget 500000 --outdir "$OUT" \
    || echo "FAILED: $task/$algo/s$seed"
}

TASKS="SafetyPointGoal1-v0 SafetyPointGoal2-v0 SafetyPointButton1-v0 \
SafetyPointButton2-v0 SafetyPointPush1-v0 SafetyPointPush2-v0"

for seed in 0 1 2; do
  for algo in ppol trpol cpo focops ddpgl cvpo sacl; do
    for task in $TASKS; do
      run_cell "$task" "$algo" "$seed"
    done
  done
done
echo "fifth pass complete"
