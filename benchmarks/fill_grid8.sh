#!/bin/bash
# Eighth pass: re-run the FULL Drone grid under the fixed dynamics
# (anisotropic linear drag, fsrl_tpu/envs/drone.py — see
# benchmarks/results_archive/drone_pre_dragfix/README.md for the diagnosis).
# All 7 algorithms x {DroneRun, DroneCircle} x 3 seeds, 2M on-policy / 300k
# off-policy (the budget tier the pre-fix grid used). Batched seeds per
# invocation; resumable.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
OUT=benchmarks/results_1m

run_cell() {
  local task=$1 algo=$2
  local missing=""
  for seed in 0 1 2; do
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
  timeout 3600 python benchmarks/run_curves.py \
    --task "$task" --algos "$algo" --seeds "$missing" --cost_limit 25.0 \
    --budget 2000000 --off_budget 300000 --outdir "$OUT" \
    || echo "FAILED: $task/$algo"
}

for algo in ppol trpol cpo focops sacl ddpgl cvpo; do
  for task in SafetyDroneRun-v0 SafetyDroneCircle-v0; do
    run_cell "$task" "$algo"
  done
done
echo "eighth pass complete"
