"""Data-parallel scaling benchmark over a virtual device mesh.

Measures the fused PPO-Lagrangian train iteration (rollout + GAE + update)
at a FIXED per-device workload (weak scaling: N_envs = envs_per_dev x n_dev)
across mesh sizes, and reports throughput + scaling efficiency vs 1 device.

The BASELINE.md north star is >=80% scaling efficiency at >=2 hosts. Real
multi-chip hardware is not reachable from this image, so this harness runs the
IDENTICAL GSPMD-partitioned program on a virtual CPU mesh
(``--xla_force_host_platform_device_count``) — same shardings, same inserted
collectives (all-reduce over the ``dp`` axis for gradients and global episodic
cost stats), different transport. Run it on a real slice unchanged.

Usage:
    python benchmarks/bench_scaling.py --devices 1,2,4,8 --envs_per_dev 64

Prints one JSON line per mesh size plus a summary efficiency table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=str, default="1,2,4,8")
    p.add_argument("--envs_per_dev", type=int, default=64)
    p.add_argument("--horizon", type=int, default=128)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--task", type=str, default="SafetyCarCircle-v0")
    p.add_argument("--out", type=str, default="benchmarks/results_scaling.json")
    args = p.parse_args()
    sizes = [int(s) for s in args.devices.split(",")]

    # force a CPU host-platform mesh BEFORE importing jax; single-threaded
    # eigen so each virtual device maps to ~one core and weak scaling up to
    # the physical core count is a fair measurement (beyond it, devices
    # timeshare cores and the numbers measure oversubscription, not the
    # program -- flagged in the output)
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={max(sizes)}"
            + " --xla_cpu_multi_thread_eigen=false")
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    from fsrl_tpu.algos.ppo_lag import PPOLag
    from fsrl_tpu.data.collector import make_rollout_fn
    from fsrl_tpu.envs import make
    from fsrl_tpu.parallel.mesh import (make_mesh, replicate_tree,
                                        shard_env_state)
    from fsrl_tpu.types import EpisodeStats

    env = make(args.task)
    results = []
    for n_dev in sizes:
        mesh = make_mesh(n_dev)
        N = args.envs_per_dev * n_dev
        T = args.horizon
        algo = PPOLag(env.observation_size, env.action_size, cost_limit=10.0,
                      repeat=4, n_minibatches=4, dp_blocks=n_dev)
        rng = jax.random.PRNGKey(0)
        state = replicate_tree(mesh, algo.init(rng))
        env_state = shard_env_state(mesh, env.reset_vec(rng, N))
        stats = shard_env_state(mesh, EpisodeStats.init(N, env.num_costs))
        rollout = make_rollout_fn(env, algo.act_fn, T)

        @jax.jit
        def train_iter(state, env_state, stats, rng):
            rng, k1, k2 = jax.random.split(rng, 3)
            res = rollout(state.params, env_state, stats.reset_aggregates(),
                          k1)
            state, metrics = algo.update(
                state, res.transitions, res.stats.mean_cost,
                res.stats.n_episodes, k2)
            return state, res.env_state, res.stats, rng, metrics

        for _ in range(2):  # compile + warm
            state, env_state, stats, rng, m = train_iter(
                state, env_state, stats, rng)
        jax.block_until_ready(m["loss/total"])

        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, env_state, stats, rng, m = train_iter(
                state, env_state, stats, rng)
        jax.block_until_ready(m["loss/total"])
        dt = time.perf_counter() - t0
        sps = args.iters * N * T / dt
        results.append((n_dev, sps))
        print(json.dumps({
            "metric": "dp_scaling_env_steps_per_s", "n_devices": n_dev,
            "n_envs": N, "value": round(sps, 1), "unit": "env-steps/s",
        }))

    base = results[0][1] / results[0][0]
    n_cores = os.cpu_count() or 1
    print(f"\nphysical cores: {n_cores} "
          f"(rows with n_dev > cores are oversubscribed)")
    print("n_dev  steps/s      per-dev      efficiency")
    rows = []
    for n_dev, sps in results:
        eff = sps / n_dev / base
        over = n_dev > n_cores
        rows.append({"n_devices": n_dev, "env_steps_per_s": round(sps, 1),
                     "efficiency_vs_1dev": round(eff, 4),
                     "oversubscribed": over})
        print(f"{n_dev:>5}  {sps:>11.0f}  {sps / n_dev:>11.0f}  {eff:>9.1%}"
              + ("  [oversubscribed]" if over else ""))
    with open(args.out, "w") as f:
        json.dump({"task": args.task, "envs_per_dev": args.envs_per_dev,
                   "horizon": args.horizon, "physical_cores": n_cores,
                   "backend": "cpu-virtual-mesh",
                   "note": "same GSPMD program as a real slice; rows beyond "
                           "the physical core count measure core "
                           "timesharing, not the program", "rows": rows}, f,
                  indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
