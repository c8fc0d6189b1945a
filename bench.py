"""Benchmark harness: the framework's full throughput story in ONE JSON line.

Headline: sustained env-steps/s of the fused PPO-Lagrangian training step
(on-device rollout + GAE + 4-epoch minibatched update) on SafetyCarCircle-v0
— the reference's headline config (BASELINE.md: "solve SafetyCarCircle-v0 in
~10 minutes on 4 CPUs").  Nested: in-trainer env-steps/s for the off-policy
algorithms (SAC-Lag / DDPG-Lag / CVPO, chunked-dispatch trainer at the
reference update:env-step ratio), plus a roofline analysis of the fused
on-policy step from XLA's own cost model (flops + bytes accessed vs TPU v5e
peak 197 bf16 TFLOP/s and 819 GB/s HBM) that substantiates where the time
goes.

Baseline derivation: the reference's only published speed claim is ~10 min
wall-clock to solve SafetyCarCircle-v0 on 4 CPUs (README.md:56) with default
configs (~1M env steps to solve at 2M budget) → ≈ 2,000 env-steps/s including
updates. vs_baseline = our steps/s / 2000.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

FSRL_BASELINE_STEPS_PER_S = 2000.0
V5E_PEAK_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def cost_analysis(compiled) -> dict:
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return dict(ca) if ca else {}
    except Exception:
        return {}


def bench_onpolicy() -> dict:
    from fsrl_tpu.algos.ppo_lag import PPOLag
    from fsrl_tpu.data.collector import make_rollout_fn
    from fsrl_tpu.envs import make
    from fsrl_tpu.types import EpisodeStats

    env = make("SafetyCarCircle-v0")
    # throughput shape: wide env batch, reference-equivalent update schedule,
    # bf16 MXU trunks (validated: same convergence as f32 on BallCircle/BallRun).
    # (4096, 64) beats (2048, 128) by ~35% — halving the sequential rollout
    # scan length amortizes per-step kernel latency across a wider batch;
    # beyond ~260k steps/iter the step is throughput-bound (time scales with
    # N*T; see the N/T sweep in docs/benchmark.md)
    N, T = 4096, 64
    # n_minibatches=8: measured fastest of the reference-faithful schedules
    # (repeat 4 fixed; 8 minibatches 17.8 ms vs 4 at 18.6, 32+ regress) —
    # and the reference itself runs ~40 minibatches/epoch (batch 256)
    algo = PPOLag(env.observation_size, env.action_size, cost_limit=10.0,
                  repeat=4, n_minibatches=8, compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    state = algo.init(rng)
    env_state = env.reset_vec(rng, N)
    stats = EpisodeStats.init(N, env.num_costs)
    # unroll=4: replicating the env-step body amortizes while-loop overhead
    # (1.44 -> 0.96 ms rollout at T=64, bench_phases.json r5)
    rollout = make_rollout_fn(env, algo.act_fn, T, unroll=4)

    @jax.jit
    def train_iter(state, env_state, stats, rng):
        rng, k1, k2 = jax.random.split(rng, 3)
        res = rollout(state.params, env_state, stats.reset_aggregates(), k1)
        state, metrics = algo.update(
            state, res.transitions, res.stats.mean_cost,
            res.stats.n_episodes, k2)
        return state, res.env_state, res.stats, rng, metrics

    # warmup/compile
    for _ in range(2):
        state, env_state, stats, rng, metrics = train_iter(
            state, env_state, stats, rng)
    jax.block_until_ready(metrics["loss/total"])

    ca = cost_analysis(train_iter.lower(state, env_state, stats, rng).compile())
    flops_per_iter = float(ca.get("flops", 0.0)) or None
    bytes_per_iter = float(ca.get("bytes accessed", 0.0)) or None

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, env_state, stats, rng, metrics = train_iter(
            state, env_state, stats, rng)
    jax.block_until_ready(metrics["loss/total"])
    dt = time.perf_counter() - t0

    steps_per_s = iters * T * N / dt
    out = {
        "metric": "ppo_lag_train_env_steps_per_s",
        "value": round(steps_per_s, 1),
        "unit": "env-steps/s (rollout+update fused, SafetyCarCircle-v0)",
        "vs_baseline": round(steps_per_s / FSRL_BASELINE_STEPS_PER_S, 2),
    }
    iter_s = dt / iters
    out["iter_ms"] = round(iter_s * 1e3, 2)
    if flops_per_iter:
        tflops = flops_per_iter / iter_s / 1e12
        out["tflops_per_s"] = round(tflops, 2)
        out["mfu_pct_bf16_v5e"] = round(100.0 * tflops / V5E_PEAK_BF16_TFLOPS,
                                        2)
    # scan-fused dispatch: K collect+update iterations inside ONE jitted
    # program (trainer's fuse_iters mode) — amortizes the per-dispatch
    # latency that the roofline identifies as the binding constraint
    K = 8

    @jax.jit
    def train_k(state, env_state, stats, rng):
        def body(carry, _):
            carry = train_iter(*carry)[:4]
            return carry, None

        (state, env_state, stats, rng), _ = jax.lax.scan(
            body, (state, env_state, stats, rng), None, length=K)
        return state, env_state, stats, rng

    state, env_state, stats, rng = train_k(state, env_state, stats, rng)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        state, env_state, stats, rng = train_k(state, env_state, stats, rng)
    jax.block_until_ready(state.params)
    dt_k = time.perf_counter() - t0
    fused_steps_per_s = reps * K * T * N / dt_k
    out["scan_fused"] = {
        "fuse_iters": K,
        "env_steps_per_s": round(fused_steps_per_s, 1),
        "vs_baseline": round(fused_steps_per_s / FSRL_BASELINE_STEPS_PER_S,
                             2),
        "iter_ms": round(dt_k / (reps * K) * 1e3, 2),
    }
    if flops_per_iter:
        out["scan_fused"]["mfu_pct_bf16_v5e"] = round(
            100.0 * flops_per_iter * reps * K / dt_k / 1e12
            / V5E_PEAK_BF16_TFLOPS, 2)
    if fused_steps_per_s > steps_per_s:
        out["value"] = round(fused_steps_per_s, 1)
        out["vs_baseline"] = round(
            fused_steps_per_s / FSRL_BASELINE_STEPS_PER_S, 2)
        out["unit"] = ("env-steps/s (rollout+update fused, 8-iter scan "
                       "dispatch, SafetyCarCircle-v0)")

    if flops_per_iter and bytes_per_iter:
        # roofline: the minimum time XLA's cost model allows on v5e is
        # max(compute, HBM); whatever the measured iter exceeds that by is
        # dispatch/serialization overhead (scan-carried env steps are
        # latency-, not bandwidth-, shaped)
        t_compute = flops_per_iter / (V5E_PEAK_BF16_TFLOPS * 1e12)
        t_hbm = bytes_per_iter / (V5E_HBM_GBPS * 1e9)
        out["hbm_bytes_per_iter"] = int(bytes_per_iter)
        out["hbm_gbps"] = round(bytes_per_iter / iter_s / 1e9, 1)
        out["roofline"] = {
            "t_compute_ms": round(t_compute * 1e3, 3),
            "t_hbm_ms": round(t_hbm * 1e3, 3),
            "t_measured_ms": round(iter_s * 1e3, 3),
            # "serialization": measured far above both floors — phase
            # attribution (benchmarks/bench_phases.py) shows the gap is
            # INTRA-program kernel serialization (rollout scan + GAE +
            # minibatch machinery each 5-10x their compute/HBM floor),
            # not host dispatch (scan-fused dispatch saves only ~1 ms)
            "bound": ("compute" if t_compute > t_hbm else "hbm")
            if max(t_compute, t_hbm) > 0.5 * iter_s
            else "serialization (intra-program; see bench_phases.json)",
            "hbm_bw_util_pct": round(100.0 * t_hbm / iter_s, 1),
        }
    return out


def bench_offpolicy_all() -> dict:
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "benchmarks"))
    from bench_offpolicy import bench_one
    res = {}
    for key in ("sacl", "ddpgl", "cvpo"):
        try:
            r = bench_one(key, n_envs=32, T=100, iters=10,
                          update_per_step=0.2, batch_size=256)
            res[key] = {"env_steps_per_s": r["env_steps_per_s"],
                        "vs_baseline": r["vs_fsrl_2k"]}
        except Exception as e:  # keep the headline even if one algo breaks
            res[key] = {"error": f"{type(e).__name__}: {str(e)[:120]}"}
    return res


def main():
    out = bench_onpolicy()
    if os.environ.get("BENCH_SKIP_OFFPOLICY") != "1":
        out["offpolicy"] = bench_offpolicy_all()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
