#!/bin/bash
# Third pass: complete the task grid at the 1M protocol.
#  - SafetyAntCircle-v0: the one Bullet-analog task with zero recorded cells
#    (round-1 verdict gap) — all 7 algorithms x 3 seeds.
#  - Navigation "2" variants (Goal2/Button2/Push2): the reference benchmarks
#    six navigation tasks (benchmark.rst:81-113); this adds the harder trio.
#  - AntRun / DroneRun on-policy seeds 1,2 (previously single-seed at 1M).
# Runs sequentially so only one job owns the TPU at a time; skips cells that
# already exist so the script is resumable.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=benchmarks/results_1m

run_cell() {
  local task=$1 algo=$2 limit=$3 seed=$4
  if ls "$OUT/$task-$algo-s$seed.json" >/dev/null 2>&1; then
    echo "skip $task/$algo/s$seed (exists)"
    return
  fi
  echo "=== $task / $algo / seed $seed (cost_limit=$limit) ==="
  timeout 1500 python benchmarks/run_curves.py \
    --task "$task" --algos "$algo" --seeds "$seed" --cost_limit "$limit" \
    --budget 1000000 --off_budget 500000 --outdir "$OUT" \
    || echo "FAILED: $task/$algo/s$seed"
}

# Seed 0 FIRST across every empty cell (coverage beats seed depth when the
# wall clock is shared), then widen to seeds 1,2.

# 1a. AntCircle seed-0 row — the one task with zero recorded cells
for algo in ppol trpol cpo focops sacl ddpgl cvpo; do
  run_cell SafetyAntCircle-v0 "$algo" 25.0 0
done

# 1b. navigation "2" variants seed 0, PPO-Lag + CPO (reference nav protocol)
for task in SafetyPointGoal2-v0 SafetyPointButton2-v0 SafetyPointPush2-v0; do
  for algo in ppol cpo; do
    run_cell "$task" "$algo" 25.0 0
  done
done

# 2. seed depth: AntCircle + nav2 seeds 1,2
for seed in 1 2; do
  for algo in ppol trpol cpo focops sacl ddpgl cvpo; do
    run_cell SafetyAntCircle-v0 "$algo" 25.0 "$seed"
  done
  for task in SafetyPointGoal2-v0 SafetyPointButton2-v0 SafetyPointPush2-v0; do
    for algo in ppol cpo; do
      run_cell "$task" "$algo" 25.0 "$seed"
    done
  done
done

# 3. AntRun / DroneRun on-policy seeds 1,2
for task in SafetyAntRun-v0 SafetyDroneRun-v0; do
  for algo in ppol trpol cpo focops; do
    for seed in 1 2; do
      run_cell "$task" "$algo" 25.0 "$seed"
    done
  done
done
echo "third pass complete"
