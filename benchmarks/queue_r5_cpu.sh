#!/bin/bash
# Round-5 CPU queue: the matched-budget velocity cells VERDICT.md item 1
# calls out (Ant ppol at the reference's 10M preset, sacl at 5M, Humanoid
# 5M). Two lanes run in parallel (`bash queue_r5_cpu.sh A` and `... B`):
# one MuJoCo-stepping-bound on-policy lane and one update-bound sacl lane
# — a single run does not saturate both cores, two lanes roughly double
# aggregate throughput.
#
# Cells are committed (pathspec-limited, so concurrent foreground commits
# are never swept in) as they land; a cell only STARTS if its estimated
# duration fits before ROUND_END. Between cells each lane drains
# benchmarks/r5_inbox/*.sh (atomically claimed via mv, deleted after run)
# so new higher-priority cells can be added without editing this running
# script (round-4 lesson: bash re-parses a running script in place).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD"          # exclude the axon site (TPU lane owns the tunnel)
export JAX_PLATFORMS=cpu
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
OUT=benchmarks/results_velocity_full
LANE=${1:-A}
ROUND_END=${ROUND_END:-$(( $(date +%s) + 25200 ))}   # default +7h
mkdir -p "$OUT" benchmarks/r5_inbox

commit_results() {
  flock benchmarks/.r5commitlock bash -c '
    python benchmarks/velocity_fidelity.py >/dev/null 2>&1
    for i in 1 2 3; do
      git add benchmarks/results_velocity_full docs/velocity_fidelity.md 2>/dev/null
      git commit -q -m "results: '"$1"' (r5 cpu queue)" \
        -- benchmarks/results_velocity_full docs/velocity_fidelity.md && break
      sleep 5
    done'
}

drain_inbox() {
  local f claimed
  for f in benchmarks/r5_inbox/*.sh; do
    [ -f "$f" ] || continue
    claimed="$f.claimed-$LANE"
    mv "$f" "$claimed" 2>/dev/null || continue   # atomic claim
    echo "=== inbox: $f (lane $LANE) ==="
    bash "$claimed"
    rm -f "$claimed"
  done
}

vel_cell() {  # task algo seed budget est_seconds
  local task=$1 algo=$2 seed=$3 budget=$4 est=$5
  drain_inbox
  if [ $(( $(date +%s) + est )) -ge "$ROUND_END" ]; then
    echo "no time for $task/$algo/s$seed (est ${est}s), skip"
    return
  fi
  [ -f "$OUT/$task-$algo-s$seed.json" ] && { echo "skip $task/$algo/s$seed"; return; }
  echo "=== vel $task / $algo / s$seed ($budget, lane $LANE) ==="
  timeout $(( est * 2 )) python benchmarks/run_velocity.py \
    --task "$task" --algos "$algo" --seeds "$seed" --cost_limit 25.0 \
    --budget "$budget" --off_budget "$budget" --outdir "$OUT" \
    || { echo "FAILED: $task/$algo/s$seed"; return; }
  commit_results "vel $task/$algo s$seed @$budget"
}

if [ "$LANE" = A ]; then
  # on-policy lane: the 10M-preset Ant cell is VERDICT #1's headline ask
  vel_cell SafetyAntVelocity-v1       ppol 0 10000000 13000
  vel_cell SafetyHumanoidVelocity-v1  ppol 0  5000000  8500
  vel_cell SafetyHopperVelocity-v1    sacl 0  5000000 10000
  vel_cell SafetyAntVelocity-v1       sacl 0  5000000 12000
  vel_cell SafetyWalker2dVelocity-v1  ppol 0 10000000 10000
else
  # sacl lane: every sub-1.0x-at-1M sacl cell re-run at the reference's 5M
  vel_cell SafetyHalfCheetahVelocity-v1 sacl 0 5000000  9500
  vel_cell SafetySwimmerVelocity-v1     sacl 0 5000000 12500
  vel_cell SafetyWalker2dVelocity-v1    sacl 0 5000000 12000
  vel_cell SafetyHopperVelocity-v1      sacl 1 5000000 10000
fi
# both lanes: drain any remaining inbox work until the round ends
while [ "$(date +%s)" -lt "$ROUND_END" ]; do
  drain_inbox
  sleep 120
done
echo "queue_r5_cpu lane $LANE complete"
