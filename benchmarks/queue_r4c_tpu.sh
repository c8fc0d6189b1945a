#!/bin/bash
# Round-4 third TPU queue: validate the "budget-limited" diagnosis for the
# DroneCircle off-policy rows by extending those cells to 1M steps (the
# 300k-tier curves are still rising at cutoff; reference plateau is 4M).
# Larger-budget rows supersede in env_fidelity (largest budget wins).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
OUT=benchmarks/results_1m
DEADLINE=${DEADLINE:-$(( $(date +%s) + 7200 ))}

while pgrep -f "bash benchmarks/queue_r4b_tpu.sh" >/dev/null 2>&1; do
  sleep 60
done

commit_results() {
  python benchmarks/make_summaries.py --dirs "$OUT" >/dev/null 2>&1
  python benchmarks/nav_fidelity.py >/dev/null 2>&1
  python benchmarks/env_fidelity.py >/dev/null 2>&1
  for i in 1 2 3; do
    git add "$OUT" docs/nav_fidelity.md docs/env_fidelity.md 2>/dev/null && \
      git commit -q -m "results: $1 (r4c queue)" && break
    sleep 5
  done
}

run_cell() {  # task algo seed
  local task=$1 algo=$2 seed=$3
  [ "$(date +%s)" -ge "$DEADLINE" ] && { echo "deadline, skip"; return; }
  # skip if this cell already ran at >= 1M (run_curves overwrites the
  # 300k-tier file in place; largest budget wins)
  if python - "$OUT/$task-$algo-s$seed.json" <<'PY'
import json, sys
try:
    raise SystemExit(0 if json.load(open(sys.argv[1]))["budget"] >= 1000000
                     else 1)
except FileNotFoundError:
    raise SystemExit(1)
PY
  then echo "skip $algo/s$seed (>=1M exists)"; return; fi
  echo "=== $task / $algo / s$seed @ 1M ==="
  timeout 3000 python benchmarks/run_curves.py \
    --task "$task" --algos "$algo" --seeds "$seed" --cost_limit 25.0 \
    --off_budget 1000000 --outdir "$OUT" \
    || { echo "FAILED: $algo/s$seed"; return; }
  commit_results "$task/$algo s$seed @1M"
}

# seed-round-robin so partial completion still gives every algo a 1M row
for seed in 0 1 2; do
  for algo in cvpo sacl; do
    run_cell SafetyDroneCircle-v0 "$algo" "$seed"
  done
done
echo "queue_r4c complete"
