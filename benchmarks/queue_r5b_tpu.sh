#!/bin/bash
# Round-5b TPU queue: AntRun weak-family re-measurement on the
# fall-cost-aligned env (envs/ant.py now charges FALL_COST on
# fall-termination, removing the die-fast degenerate feasible point that
# stalled 1-in-3 on-policy seeds — see docs/env_fidelity.md diagnosis).
# Pre-change on-policy AntRun results are archived first (they measured a
# different env); trpol/sacl/ddpgl/cvpo rows keep with an env-version note
# (their committed policies fly/walk without falling, so eval is unchanged).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache_tpu"
R1=benchmarks/results_1m
R5=benchmarks/results_5m
ROUND_END=${ROUND_END:-$(( $(date +%s) + 4500 ))}
mkdir -p benchmarks/results_archive/pre_fallcost_ant

if ls $R5/SafetyAntRun-v0-{ppol,focops}-s*.json >/dev/null 2>&1 || \
   ls $R1/SafetyAntRun-v0-{ppol,focops,cpo}-s*.json >/dev/null 2>&1; then
  for f in $R5/SafetyAntRun-v0-ppol-s*.json $R5/SafetyAntRun-v0-focops-s*.json \
           $R1/SafetyAntRun-v0-ppol-s*.json $R1/SafetyAntRun-v0-focops-s*.json \
           $R1/SafetyAntRun-v0-cpo-s*.json; do
    [ -f "$f" ] && git mv "$f" benchmarks/results_archive/pre_fallcost_ant/ 2>/dev/null \
      || { [ -f "$f" ] && mv "$f" benchmarks/results_archive/pre_fallcost_ant/; }
  done
  python benchmarks/env_fidelity.py >/dev/null 2>&1
  git add -A benchmarks/results_archive $R1 $R5 docs/env_fidelity.md
  git commit -q -m "archive pre-fall-cost AntRun on-policy results (env semantics changed)" \
    -- benchmarks/results_archive $R1 $R5 docs/env_fidelity.md || true
fi

commit_results() {
  flock benchmarks/.r5commitlock bash -c '
    python benchmarks/env_fidelity.py >/dev/null 2>&1
    for i in 1 2 3; do
      git add benchmarks/results_1m benchmarks/results_5m docs/env_fidelity.md 2>/dev/null
      git commit -q -m "results: '"$1"' (r5b tpu queue, fall-cost env)" \
        -- benchmarks/results_1m benchmarks/results_5m docs/env_fidelity.md && break
      sleep 5
    done'
}

cell() {  # outdir task algo seed budget off_budget est_seconds
  local out=$1 task=$2 algo=$3 seed=$4 budget=$5 off=$6 est=$7
  if [ $(( $(date +%s) + est )) -ge "$ROUND_END" ]; then
    echo "no time for $task/$algo/s$seed"; return
  fi
  [ -f "$out/$task-$algo-s$seed.json" ] && { echo "skip $task/$algo/s$seed"; return; }
  echo "=== $task / $algo / s$seed (on:$budget off:$off) ==="
  timeout $(( est * 3 )) python benchmarks/run_curves.py \
    --task "$task" --algos "$algo" --seeds "$seed" --cost_limit 25.0 \
    --budget "$budget" --off_budget "$off" --outdir "$out" \
    || { echo "FAILED: $task/$algo/s$seed"; return; }
  commit_results "$task/$algo s$seed"
}

# breadth-first: one seed of each weak family, then depth
for seed in 0 1 2; do
  cell $R1 SafetyAntRun-v0 ppol   $seed 2500000 1000000 700
  cell $R1 SafetyAntRun-v0 focops $seed 2500000 1000000 700
  cell $R1 SafetyAntRun-v0 cpo    $seed 2500000 1000000 800
done
echo "queue_r5b_tpu complete"
