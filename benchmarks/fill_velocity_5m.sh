#!/bin/bash
# Velocity suite at the reference's budgets (MujocoBaseCfg: 5M steps,
# cost_limit 25, reference examples/mlp/train_ppol_agent.py:55-61), 3 seeds
# on the cheap tasks + one labeled reduced-budget Humanoid run (reference
# prescribes Mujoco20MCfg there). Host-path training against real MuJoCo
# through the CPU-inference fast path. Resumable: existing cells skipped.
set -u
cd "$(dirname "$0")/.."
# Run entirely on local CPU: the learner MLPs are tiny (updates are cheap vs
# MuJoCo stepping) and the TPU tunnel admits one client at a time — keeping
# velocity off the accelerator lets the Bullet/nav grids own the TPU lane.
# PYTHONPATH deliberately EXCLUDES the axon plugin site (its sitecustomize
# blocks backend init while another process holds the tunnel).
export PYTHONPATH="$PWD"
export JAX_PLATFORMS=cpu
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
OUT=benchmarks/results_velocity_5m

run_cell() {
  local task=$1 algo=$2 seed=$3 budget=$4
  if ls "$OUT/$task-$algo-s$seed.json" >/dev/null 2>&1; then
    echo "skip $task/$algo/s$seed (exists)"
    return
  fi
  echo "=== $task / $algo / seed $seed ($budget) ==="
  timeout 5400 python benchmarks/run_velocity.py \
    --task "$task" --algos "$algo" --seeds "$seed" --cost_limit 25.0 \
    --budget "$budget" --outdir "$OUT" \
    || echo "FAILED: $task/$algo/s$seed"
}

# seed 0 across tasks first, then depth
for seed in 0 1 2; do
  for task in SafetyHalfCheetahVelocity-v1 SafetyHopperVelocity-v1 \
              SafetySwimmerVelocity-v1; do
    run_cell "$task" ppol "$seed" 5000000
  done
done

# Humanoid: reference budget is 20M (Mujoco20MCfg); one 5M run, labeled by
# its budget field in the JSON
run_cell SafetyHumanoidVelocity-v1 ppol 0 5000000
echo "velocity 5M pass complete"
