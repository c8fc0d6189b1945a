#!/bin/bash
# Round-4 follow-up TPU queue (runs after queue_r4_tpu completes):
#  A. re-run the weak off-policy Bullet cells (DroneCircle cvpo 0.44x /
#     ddpgl 0.46x / sacl-s2 marginal, AntRun cvpo 0.63x) under the
#     round-4 hardened controller stack — cheap (300k off-policy cells);
#  B. n=3 fills for the 5M-tier cells backing quoted fidelity rows
#     (AntRun ppol/trpol/focops, AntCircle ppol/trpol) — verdict ask #7.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
OUT=benchmarks/results_1m
OUT5=benchmarks/results_5m
DEADLINE=${DEADLINE:-$(( $(date +%s) + 10800 ))}

while pgrep -f "bash benchmarks/queue_r4_tpu.sh" >/dev/null 2>&1; do
  sleep 60
done

commit_results() {
  python benchmarks/make_summaries.py --dirs "$OUT,$OUT5" >/dev/null 2>&1
  python benchmarks/nav_fidelity.py >/dev/null 2>&1
  python benchmarks/env_fidelity.py >/dev/null 2>&1
  for i in 1 2 3; do
    git add "$OUT" "$OUT5" docs/nav_fidelity.md docs/env_fidelity.md \
      2>/dev/null && git commit -q -m "results: $1 (r4b queue)" && break
    sleep 5
  done
}

run_cell() {  # outdir task algo seeds bflag budget
  local out=$1 task=$2 algo=$3 seeds=$4 bflag=$5 budget=$6
  [ "$(date +%s)" -ge "$DEADLINE" ] && { echo "deadline, skip $task/$algo"; return; }
  local missing=""
  for s in ${seeds//,/ }; do
    [ -f "$out/$task-$algo-s$s.json" ] || missing="$missing,$s"
  done
  missing="${missing#,}"
  [ -z "$missing" ] && { echo "skip $task/$algo"; return; }
  echo "=== $task / $algo / seeds $missing -> $out ==="
  timeout 4200 python benchmarks/run_curves.py \
    --task "$task" --algos "$algo" --seeds "$missing" --cost_limit 25.0 \
    "$bflag" "$budget" --outdir "$out" \
    || { echo "FAILED: $task/$algo"; return; }
  commit_results "$task/$algo s$missing"
}

# ---- phase A: weak off-policy cells, hardened stack ----
for f in \
  "SafetyDroneCircle-v0 cvpo 0,1,2" \
  "SafetyDroneCircle-v0 ddpgl 0,1,2" \
  "SafetyDroneCircle-v0 sacl 2" \
  "SafetyAntRun-v0 cvpo 0,1,2" \
  ; do
  set -- $f
  marker="$OUT/.r4b_rerun_$1_$2"
  if [ ! -f "$marker" ] && [ "$(date +%s)" -lt "$DEADLINE" ]; then
    for s in ${3//,/ }; do rm -f "$OUT/$1-$2-s$s.json"; done
    touch "$marker"
  fi
  run_cell "$OUT" "$1" "$2" "$3" --off_budget 300000
done

# ---- phase B: 5M-tier n=3 fills ----
run_cell "$OUT5" SafetyAntRun-v0 ppol 1,2 --budget 5000000
run_cell "$OUT5" SafetyAntRun-v0 trpol 1,2 --budget 5000000
run_cell "$OUT5" SafetyAntRun-v0 focops 1,2 --budget 5000000
run_cell "$OUT5" SafetyAntCircle-v0 ppol 1,2 --budget 5000000
run_cell "$OUT5" SafetyAntCircle-v0 trpol 1,2 --budget 5000000

echo "queue_r4b_tpu complete"
