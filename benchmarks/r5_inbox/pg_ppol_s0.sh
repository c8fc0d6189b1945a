# real-MuJoCo PointGoal1 cell (VERDICT #10)
cd "$(dirname "$0")/../.."
export PYTHONPATH="$PWD"
export JAX_PLATFORMS=cpu
timeout 7000 python benchmarks/run_pointgoal.py --algos ppol --seeds 0   --budget 1000000 --outdir benchmarks/results_pointgoal
for i in 1 2 3; do
  python benchmarks/nav_fidelity.py >/dev/null 2>&1
  git add benchmarks/results_pointgoal docs/nav_fidelity.md &&     git commit -q -m "results: PointGoal1-MJ ppol s0 (real MuJoCo, r5 inbox)"     -- benchmarks/results_pointgoal docs/nav_fidelity.md && break
  sleep 5
done
