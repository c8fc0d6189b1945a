#!/bin/bash
# Round-5 TPU queue (owns the tunnel — serialize all TPU work through here).
#
#  0. Archive every pre-floor-alignment Drone* result (the ground-plane
#     semantics changed in fsrl_tpu/envs/drone.py; old JSONs measured a
#     different env and must not be pooled with new ones).
#  1. DroneRun full re-run on the aligned env — broken families first
#     (VERDICT #2: trpol/cpo/sacl must reach reward scale feasibly).
#  2. DroneCircle re-run, breadth-first (n=1 per family) then depth; ppol/
#     trpol/cpo at the registry's 5M preset (VERDICT #7).
#  3. BallCircle ddpgl diagnosis probes (VERDICT weak #9).
#  4. AntCircle 10M ppol (preset-tier, no published reference curve).
# Cells commit as they land (pathspec-limited); deadline-gated.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache_tpu"
R1=benchmarks/results_1m
R5=benchmarks/results_5m
ROUND_END=${ROUND_END:-$(( $(date +%s) + 14400 ))}   # default +4h
mkdir -p benchmarks/results_archive/pre_floor_drone

# ---- 0. archive pre-floor Drone results ----
if ls $R1/SafetyDrone*-v0-*.json >/dev/null 2>&1; then
  git mv $R1/SafetyDrone*-v0-*.json benchmarks/results_archive/pre_floor_drone/ 2>/dev/null || \
    mv $R1/SafetyDrone*-v0-*.json benchmarks/results_archive/pre_floor_drone/
  rm -f $R1/summary-SafetyDroneRun-v0.md $R1/summary-SafetyDroneCircle-v0.md \
        $R1/curves-SafetyDrone*.png
  python benchmarks/env_fidelity.py >/dev/null 2>&1
  git add -A benchmarks/results_archive $R1 docs/env_fidelity.md
  git commit -q -m "archive pre-floor-alignment Drone results (env semantics changed)" \
    -- benchmarks/results_archive $R1 docs/env_fidelity.md || true
fi

commit_results() {
  flock benchmarks/.r5commitlock bash -c '
    python benchmarks/env_fidelity.py >/dev/null 2>&1
    for i in 1 2 3; do
      git add benchmarks/results_1m benchmarks/results_5m docs/env_fidelity.md 2>/dev/null
      git commit -q -m "results: '"$1"' (r5 tpu queue)" \
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

# ---- 1. DroneRun on the aligned env: broken families first ----
for seed in 0 1 2; do
  cell $R1 SafetyDroneRun-v0 trpol $seed 2000000 1000000 600
  cell $R1 SafetyDroneRun-v0 cpo   $seed 2000000 1000000 600
  cell $R1 SafetyDroneRun-v0 sacl  $seed 2000000 1000000 600
done
for seed in 0 1 2; do
  cell $R1 SafetyDroneRun-v0 ppol   $seed 2000000 1000000 600
  cell $R1 SafetyDroneRun-v0 focops $seed 2000000 1000000 600
  cell $R1 SafetyDroneRun-v0 ddpgl  $seed 2000000 1000000 600
  cell $R1 SafetyDroneRun-v0 cvpo   $seed 2000000 1000000 600
done

# ---- 2. DroneCircle: breadth-first, 5M preset for the on-policy tier ----
for seed in 0 1 2; do
  cell $R5 SafetyDroneCircle-v0 ppol   $seed 5000000 2000000 1400
  cell $R5 SafetyDroneCircle-v0 trpol  $seed 5000000 2000000 1500
  cell $R5 SafetyDroneCircle-v0 sacl   $seed 5000000 2000000 1300
  cell $R5 SafetyDroneCircle-v0 cpo    $seed 5000000 2000000 1500
  cell $R5 SafetyDroneCircle-v0 focops $seed 5000000 2000000 1400
  cell $R5 SafetyDroneCircle-v0 ddpgl  $seed 5000000 1000000 700
  cell $R5 SafetyDroneCircle-v0 cvpo   $seed 5000000 1000000 800
done

# ---- 3. AntCircle at the 10M preset (registry budget; 1 seed first) ----
for seed in 0 1 2; do
  cell $R5 SafetyAntCircle-v0 ppol $seed 10000000 2000000 2500
done

echo "queue_r5_tpu complete"
