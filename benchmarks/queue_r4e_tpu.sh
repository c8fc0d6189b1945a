#!/bin/bash
# Round-4 fifth TPU batch: 1M extensions for AntRun ddpgl (0.82x) and the

# DroneRun off-policy rows (upside beyond parity; breadth-first).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
OUT=benchmarks/results_1m
DEADLINE=${DEADLINE:-$(( $(date +%s) + 5400 ))}

commit_results() {
  python benchmarks/make_summaries.py --dirs "$OUT" >/dev/null 2>&1
  python benchmarks/nav_fidelity.py >/dev/null 2>&1
  python benchmarks/env_fidelity.py >/dev/null 2>&1
  for i in 1 2 3; do
    git add "$OUT" docs/nav_fidelity.md docs/env_fidelity.md 2>/dev/null && \
      git commit -q -m "results: $1 (r4d queue)" && break
    sleep 5
  done
}

run_cell() {  # task algo seed bflag budget
  local task=$1 algo=$2 seed=$3 bflag=$4 budget=$5
  [ "$(date +%s)" -ge "$DEADLINE" ] && { echo "deadline, skip"; return; }
  if python - "$OUT/$task-$algo-s$seed.json" "$budget" <<'PY'
import json, sys
try:
    raise SystemExit(0 if json.load(open(sys.argv[1]))["budget"] >=
                     int(sys.argv[2]) else 1)
except FileNotFoundError:
    raise SystemExit(1)
PY
  then echo "skip $task/$algo/s$seed"; return; fi
  echo "=== $task / $algo / s$seed @ $budget ==="
  timeout 3600 python benchmarks/run_curves.py \
    --task "$task" --algos "$algo" --seeds "$seed" --cost_limit 25.0 \
    "$bflag" "$budget" --outdir "$OUT" \
    || { echo "FAILED"; return; }
  commit_results "$task/$algo s$seed @$budget"
}

for seed in 0 1 2; do
  run_cell SafetyAntRun-v0 ddpgl "$seed" --off_budget 1000000
  run_cell SafetyDroneRun-v0 sacl "$seed" --off_budget 1000000
  run_cell SafetyDroneRun-v0 cvpo "$seed" --off_budget 1000000
  run_cell SafetyDroneRun-v0 ddpgl "$seed" --off_budget 1000000
done
echo "queue_r4e complete"
