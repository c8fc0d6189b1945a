#!/bin/bash
# Seventh pass: off-policy evidence gaps from the round-2 verdict.
#  * AntCircle sacl/ddpgl/cvpo seeds 1-2 at 500k — back (or retract) the
#    "off-policy learns AntCircle at 500k" headline with 3 seeds.
#  * CarCircle sacl/ddpgl 3 seeds at 500k — the committed CarCircle
#    off-policy rows predate the round-1 stability fix and best-checkpoint
#    tracking (old benchmarks/results/ JSONs, final cost 126-312); re-run
#    with the current code so the fidelity table quotes the deploy rule.
# Batched seeds per invocation (one compile per cell). Resumable.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
OUT=benchmarks/results_1m

run_cell() {
  local task=$1 algo=$2 seeds=$3
  local missing=""
  for seed in ${seeds//,/ }; do
    if ! ls "$OUT/$task-$algo-s$seed.json" >/dev/null 2>&1; then
      missing="$missing,$seed"
    fi
  done
  missing="${missing#,}"
  if [ -z "$missing" ]; then
    echo "skip $task/$algo (all seeds exist)"
    return
  fi
  echo "=== $task / $algo / seeds $missing ==="
  timeout 3000 python benchmarks/run_curves.py \
    --task "$task" --algos "$algo" --seeds "$missing" --cost_limit 25.0 \
    --budget 1000000 --off_budget 500000 --outdir "$OUT" \
    || echo "FAILED: $task/$algo"
}

run_cell SafetyCarCircle-v0 sacl 0,1,2
run_cell SafetyCarCircle-v0 ddpgl 0,1,2
run_cell SafetyAntCircle-v0 sacl 1,2
run_cell SafetyAntCircle-v0 ddpgl 1,2
run_cell SafetyAntCircle-v0 cvpo 1,2

# leftover 5M on-policy holes from the fidelity table (Ant cells; the Drone
# 5M queue is superseded by fill_grid8's post-dragfix re-grid)
run_5m() {
  local task=$1 algo=$2
  if ls "benchmarks/results_5m/$task-$algo-s0.json" >/dev/null 2>&1; then
    echo "skip 5m $task/$algo"; return
  fi
  echo "=== 5M $task / $algo ==="
  timeout 3600 python benchmarks/run_curves.py \
    --task "$task" --algos "$algo" --seeds 0 --cost_limit 25.0 \
    --budget 5000000 --step_per_epoch 50000 --outdir benchmarks/results_5m \
    || echo "FAILED: 5m $task/$algo"
}
run_5m SafetyAntRun-v0 focops
run_5m SafetyAntCircle-v0 trpol
run_5m SafetyAntCircle-v0 ppol
echo "seventh pass complete"
