#!/bin/bash
# Fourth pass: big-budget on-policy cells for the tasks where 0.5-1M steps is
# not enough (the reference's own curves put Drone/Ant on-policy plateaus at
# 1.5-2.5M steps, docs/tutorials/benchmark.rst). 5M steps, 100 epochs of 50k,
# writing to results_5m so the budget tier is explicit.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=benchmarks/results_5m

run_cell() {
  local task=$1 algo=$2 seed=$3
  if ls "$OUT/$task-$algo-s$seed.json" >/dev/null 2>&1; then
    echo "skip $task/$algo/s$seed (exists)"
    return
  fi
  echo "=== $task / $algo / seed $seed (5M) ==="
  timeout 2400 python benchmarks/run_curves.py \
    --task "$task" --algos "$algo" --seeds "$seed" --cost_limit 25.0 \
    --budget 5000000 --step_per_epoch 50000 --outdir "$OUT" \
    || echo "FAILED: $task/$algo/s$seed"
}

# worst fidelity-table rows first (docs/env_fidelity.md): on-policy Drone/Ant
for cell in \
  "SafetyDroneRun-v0 trpol" "SafetyDroneRun-v0 ppol" "SafetyDroneRun-v0 cpo" \
  "SafetyAntRun-v0 trpol" "SafetyAntRun-v0 ppol" \
  "SafetyDroneCircle-v0 ppol" "SafetyDroneCircle-v0 cpo" \
  "SafetyDroneCircle-v0 focops" "SafetyAntCircle-v0 trpol"; do
  run_cell $cell 0
done
echo "fourth pass complete"
