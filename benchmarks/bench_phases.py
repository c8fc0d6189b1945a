"""Phase attribution for the fused PPO-Lag training iteration.

METHODOLOGY (round-5 correction): all timings use K-scan differencing with
CHAINED state — time jit(scan(body, K))(c) with c = f(c) between calls, and
report (t(K_hi) - t(1)) / (K_hi - 1) as the per-iteration device time.
Identical-args repetition through the tunneled TPU reads FALSELY LOW (a
chain of 64 dependent 32k x 128 x 128 gemms "measured" 0.022 ms = 3000
TFLOP/s — impossible; the tunnel appears to dedupe repeat executions of the
same (executable, args) pair). Round-4's bench_phases.json component
numbers (e.g. rollout 0.15 ms) are contaminated by this; the honest rollout
cost is ~1.3 ms at (4096, 64). jax.profiler traces DO work through the
tunnel and corroborate the scan-differenced numbers
(``benchmarks/bench_update_breakdown.json``).

Usage:  python benchmarks/bench_phases.py            # on the TPU
        JAX_PLATFORMS=cpu python benchmarks/bench_phases.py --small 1
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from fsrl_tpu.config.cli import cli


@dataclass
class PhaseCfg:
    N: int = 4096
    T: int = 64
    iters: int = 8
    K: int = 8              # scan length for differencing
    small: int = 0          # CPU smoke mode
    out: str = "benchmarks/bench_phases.json"


def scan_diff_time(make_body, carry0, K, iters, leaf):
    """Device ms/iteration via chained K-scan differencing."""
    def timed(KK):
        f = jax.jit(lambda c: jax.lax.scan(make_body, c, None, length=KK)[0])
        c = f(carry0)
        jax.block_until_ready(leaf(c))
        t0 = time.perf_counter()
        for _ in range(iters):
            c = f(c)
        jax.block_until_ready(leaf(c))
        return (time.perf_counter() - t0) / iters * 1e3
    t1, tK = timed(1), timed(K)
    return (tK - t1) / (K - 1), t1


@cli(PhaseCfg)
def main(cfg: PhaseCfg):
    from fsrl_tpu.algos.ppo_lag import PPOLag
    from fsrl_tpu.data.collector import make_rollout_fn
    from fsrl_tpu.envs import make
    from fsrl_tpu.types import EpisodeStats

    if cfg.small:
        cfg.N, cfg.T, cfg.iters, cfg.K = 256, 16, 2, 3
    env = make("SafetyCarCircle-v0")
    algo = PPOLag(env.observation_size, env.action_size, cost_limit=10.0,
                  repeat=4, n_minibatches=8, compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    state = algo.init(rng)
    env_state = env.reset_vec(rng, cfg.N)
    stats = EpisodeStats.init(cfg.N, env.num_costs)
    res = {"N": cfg.N, "T": cfg.T,
           "methodology": "chained K-scan differencing (see module doc)"}

    # --- rollout only, unroll sweep ---
    for unroll in (1, 4):
        ro = make_rollout_fn(env, algo.act_fn, cfg.T, unroll=unroll)

        def body(carry, _, _ro=ro):
            es, st, rng = carry
            rng, k = jax.random.split(rng)
            out = _ro(state.params, es, st, k)
            return (out.env_state, out.stats, rng), None

        t, t1 = scan_diff_time(body, (env_state, stats, rng), cfg.K,
                               cfg.iters, lambda c: c[0])
        res[f"t_rollout_unroll{unroll}_ms"] = t

    # --- full fused iteration ---
    ro = make_rollout_fn(env, algo.act_fn, cfg.T)

    def full_body(carry, _):
        st, es, sts, rng = carry
        rng, k1, k2 = jax.random.split(rng, 3)
        out = ro(st.params, es, sts.reset_aggregates(), k1)
        st, _ = algo.update(st, out.transitions, out.stats.mean_cost,
                            out.stats.n_episodes, k2)
        return (st, out.env_state, out.stats, rng), None

    t_full, t1 = scan_diff_time(full_body, (state, env_state, stats, rng),
                                cfg.K, cfg.iters, lambda c: c[0].params)
    res["t_full_device_ms"] = t_full
    res["t_dispatch_ms"] = max(t1 - t_full, 0.0)
    res["t_update_ms"] = t_full - res["t_rollout_unroll1_ms"]
    res["steps_per_s_device"] = cfg.N * cfg.T / t_full * 1e3

    # --- gae_impl sweep: full iteration with each GAE backend ---
    res["gae_impl_sweep"] = {}
    for impl in ("pscan", "scan", "pallas"):
        if cfg.small and impl == "pallas":
            continue   # pallas path needs the TPU (interpret twin in tests)
        algo_g = PPOLag(env.observation_size, env.action_size,
                        cost_limit=10.0, repeat=4, n_minibatches=8,
                        compute_dtype=jnp.bfloat16, gae_impl=impl)
        st_g = algo_g.init(rng)
        ro_g = make_rollout_fn(env, algo_g.act_fn, cfg.T, unroll=4)

        def gb(carry, _, _ro=ro_g, _a=algo_g):
            st, es, sts, rng = carry
            rng, k1, k2 = jax.random.split(rng, 3)
            out = _ro(st.params, es, sts.reset_aggregates(), k1)
            st, _ = _a.update(st, out.transitions, out.stats.mean_cost,
                              out.stats.n_episodes, k2)
            return (st, out.env_state, out.stats, rng), None

        t, _ = scan_diff_time(gb, (st_g, env_state, stats, rng), cfg.K,
                              cfg.iters, lambda c: c[0].params)
        res["gae_impl_sweep"][impl] = round(t, 3)

    # --- (N, T) sweep at constant N*T (full iteration) ---
    res["shape_sweep"] = {}
    for N2, T2 in ((cfg.N, cfg.T), (cfg.N * 2, cfg.T // 2),
                   (cfg.N * 4, cfg.T // 4)):
        if T2 < 4:
            continue
        es2 = env.reset_vec(rng, N2)
        st2 = EpisodeStats.init(N2, env.num_costs)
        ro2 = make_rollout_fn(env, algo.act_fn, T2)

        def fb2(carry, _, _ro=ro2):
            st, es, sts, rng = carry
            rng, k1, k2 = jax.random.split(rng, 3)
            out = _ro(st.params, es, sts.reset_aggregates(), k1)
            st, _ = algo.update(st, out.transitions, out.stats.mean_cost,
                                out.stats.n_episodes, k2)
            return (st, out.env_state, out.stats, rng), None

        t, _ = scan_diff_time(fb2, (state, es2, st2, rng), cfg.K,
                              cfg.iters, lambda c: c[0].params)
        res["shape_sweep"][f"N{N2}_T{T2}"] = {
            "t_ms": round(t, 2), "steps_per_s": round(N2 * T2 / t * 1e3)}

    for k, v in res.items():
        if isinstance(v, float):
            res[k] = round(v, 3)
    print(json.dumps(res, indent=1))
    with open(cfg.out, "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
