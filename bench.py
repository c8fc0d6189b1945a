"""Benchmark harness: sustained env-steps/s of the fused PPO-Lagrangian
training step (on-device rollout + GAE + 4-epoch minibatched update) on
SafetyCarCircle-v0 — the reference's headline config (BASELINE.md: "solve
SafetyCarCircle-v0 in ~10 minutes on 4 CPUs").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation: the reference's only published speed claim is ~10 min
wall-clock to solve SafetyCarCircle-v0 on 4 CPUs (README.md:56) with default
configs (~1M env steps to solve at 2M budget) → ≈ 2,000 env-steps/s including
updates. vs_baseline = our steps/s / 2000.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

FSRL_BASELINE_STEPS_PER_S = 2000.0


def main():
    from fsrl_tpu.algos.ppo_lag import PPOLag
    from fsrl_tpu.data.collector import make_rollout_fn
    from fsrl_tpu.envs import make
    from fsrl_tpu.types import EpisodeStats

    env = make("SafetyCarCircle-v0")
    # throughput shape: wide env batch, reference-equivalent update schedule,
    # bf16 MXU trunks (validated: same convergence as f32 on BallCircle/BallRun)
    N, T = 2048, 128
    algo = PPOLag(env.observation_size, env.action_size, cost_limit=10.0,
                  repeat=4, n_minibatches=4, compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    state = algo.init(rng)
    env_state = env.reset_vec(rng, N)
    stats = EpisodeStats.init(N, env.num_costs)
    rollout = make_rollout_fn(env, algo.act_fn, T)

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

    # FLOPs per iteration from XLA's own cost model -> MFU estimate
    flops_per_iter = None
    try:
        compiled = train_iter.lower(state, env_state, stats, rng).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops_per_iter = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

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
    if flops_per_iter:
        # TPU v5e peak ~197 TFLOP/s bf16; MLP-scale safe RL is latency/HBM
        # bound, so single-digit MFU is expected — reported for honesty, and
        # to catch regressions in the compute path
        tflops = flops_per_iter * iters / dt / 1e12
        out["tflops_per_s"] = round(tflops, 2)
        out["mfu_pct_bf16_v5e"] = round(100.0 * tflops / 197.0, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
