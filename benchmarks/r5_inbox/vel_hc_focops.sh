# HalfCheetah velocity on-policy family extension (real MuJoCo, 1M)
cd "$(dirname "$0")/../.."
export PYTHONPATH="$PWD"
export JAX_PLATFORMS=cpu
timeout 5000 python benchmarks/run_velocity.py   --task SafetyHalfCheetahVelocity-v1 --algos focops --seeds 0   --cost_limit 25.0 --budget 1000000 --outdir benchmarks/results_velocity_full
for i in 1 2 3; do
  python benchmarks/velocity_fidelity.py >/dev/null 2>&1
  git add benchmarks/results_velocity_full docs/velocity_fidelity.md &&     git commit -q -m "results: vel HalfCheetah/focops s0 1M (family extension, r5 inbox)"     -- benchmarks/results_velocity_full docs/velocity_fidelity.md && break
  sleep 5
done
