#!/bin/bash
# Round-4 CPU queue (runs after fill_velocity_5m exits; everything here is
# local-CPU so the TPU lane keeps the tunnel):
#  1. SAC-Lag on the 5 velocity tasks at 1M x 3 seeds (verdict ask #4 —
#     "sacl has never run past 300k"; hardened controller);
#  2. PPO-Lag Walker2d/Ant at the reference's 10M preset budget;
#  3. nav on-policy re-runs of the infeasible "2"-task cells with the
#     stronger-integral PID (ki 4x — gain sweep: base never reaches the
#     lambda equilibrium in-budget, final cost ~55 all run).
# Cells are committed as they land; no new cell starts after DEADLINE.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD"         # exclude the axon site (tunnel is TPU lane's)
export JAX_PLATFORMS=cpu
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
VOUT=benchmarks/results_velocity_5m
NOUT=benchmarks/results_1m
DEADLINE=${DEADLINE:-$(( $(date +%s) + 19800 ))}   # default: +5.5h

while pgrep -f "bash benchmarks/fill_velocity_5m.sh" >/dev/null 2>&1; do
  sleep 60
done

commit_results() {
  python benchmarks/make_summaries.py --dirs "$VOUT,$NOUT" >/dev/null 2>&1
  python benchmarks/nav_fidelity.py >/dev/null 2>&1
  python benchmarks/velocity_fidelity.py >/dev/null 2>&1
  for i in 1 2 3; do
    git add "$VOUT" "$NOUT" docs/nav_fidelity.md docs/velocity_fidelity.md \
      2>/dev/null && git commit -q -m "results: $1 (r4 cpu queue)" && break
    sleep 5
  done
}

vel_cell() {  # task algo seed budget
  local task=$1 algo=$2 seed=$3 budget=$4
  [ "$(date +%s)" -ge "$DEADLINE" ] && { echo "deadline, skip $task"; return; }
  [ -f "$VOUT/$task-$algo-s$seed.json" ] && { echo "skip $task/$algo/s$seed"; return; }
  echo "=== vel $task / $algo / s$seed ($budget) ==="
  timeout 5400 python benchmarks/run_velocity.py \
    --task "$task" --algos "$algo" --seeds "$seed" --cost_limit 25.0 \
    --budget "$budget" --off_budget "$budget" --outdir "$VOUT" \
    || { echo "FAILED: $task/$algo/s$seed"; return; }
  commit_results "vel $task/$algo s$seed"
}

nav_cell() {  # task algo seeds
  local task=$1 algo=$2 seeds=$3
  [ "$(date +%s)" -ge "$DEADLINE" ] && { echo "deadline, skip $task"; return; }
  local missing=""
  for s in ${seeds//,/ }; do
    [ -f "$NOUT/$task-$algo-s$s.json" ] || missing="$missing,$s"
  done
  missing="${missing#,}"
  [ -z "$missing" ] && { echo "skip $task/$algo"; return; }
  echo "=== nav $task / $algo / seeds $missing (ki4x pid) ==="
  timeout 4200 python benchmarks/run_curves.py \
    --task "$task" --algos "$algo" --seeds "$missing" --cost_limit 25.0 \
    --budget 1000000 --off_budget 500000 --outdir "$NOUT" \
    --pid_onpolicy "0.05,0.002,0.1" \
    || { echo "FAILED: $task/$algo"; return; }
  commit_results "nav $task/$algo s$missing"
}

# ---- phase 1: sacl velocity, breadth-first (seed 0 across tasks) ----
for seed in 0 1 2; do
  for task in SafetyHalfCheetahVelocity-v1 SafetyHopperVelocity-v1 \
              SafetySwimmerVelocity-v1 SafetyWalker2dVelocity-v1 \
              SafetyAntVelocity-v1; do
    vel_cell "$task" sacl "$seed" 1000000
  done
done

# ---- phase 2 (nav on-policy retunes run in queue_r4_nav.sh immediately,
#      not here) ---- phase 3: 10M preset PPO-Lag (reference budget for Walker2d/Ant) ----
vel_cell SafetyWalker2dVelocity-v1 ppol 0 10000000
vel_cell SafetyAntVelocity-v1 ppol 0 10000000

echo "queue_r4_cpu complete"
