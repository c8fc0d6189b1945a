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
echo "seventh pass complete"
