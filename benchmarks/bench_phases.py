"""Phase attribution for the fused PPO-Lag training iteration.

Round-3 verdict #6: the roofline labels the fused step "latency/dispatch"
bound (HBM floor 2.39 ms vs 19.21 ms measured), but the 8-iter scan-fused
dispatch — which removes host dispatch entirely — only saved ~1 ms, so
~16 ms/iter is INTRA-program serialization and was unattributed.

jax.profiler traces are unreliable through the tunneled TPU, so this uses
differential timing of sub-programs compiled from the same building blocks:

    t_noop      dispatch + sync floor (trivial jitted program)
    t_rollout   rollout scan only (T sequential vmapped env+policy steps)
    t_update    update only (GAE + minibatch epochs) on a captured segment
    t_full      the full fused iteration

plus a rollout `unroll` sweep (lax.scan unroll replicates the step body in
the compiled loop, amortizing per-iteration loop overhead) and an (N, T)
shape sweep at constant N*T.

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
    iters: int = 10
    small: int = 0          # CPU smoke mode
    out: str = "benchmarks/bench_phases.json"


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


@cli(PhaseCfg)
def main(cfg: PhaseCfg):
    from fsrl_tpu.algos.ppo_lag import PPOLag
    from fsrl_tpu.data.collector import make_rollout_fn
    from fsrl_tpu.envs import make
    from fsrl_tpu.types import EpisodeStats

    if cfg.small:
        cfg.N, cfg.T, cfg.iters = 256, 16, 3
    env = make("SafetyCarCircle-v0")
    algo = PPOLag(env.observation_size, env.action_size, cost_limit=10.0,
                  repeat=4, n_minibatches=4, compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    state = algo.init(rng)
    res = {"N": cfg.N, "T": cfg.T}

    # --- dispatch floor ---
    x = jnp.zeros((8, 8))
    noop = jax.jit(lambda a: a + 1.0)
    res["t_noop_ms"] = timeit(noop, x, iters=cfg.iters * 3) * 1e3

    # --- rollout only, unroll sweep ---
    env_state = env.reset_vec(rng, cfg.N)
    stats = EpisodeStats.init(cfg.N, env.num_costs)
    for unroll in (1, 2, 4, 8):
        ro = make_rollout_fn(env, algo.act_fn, cfg.T, unroll=unroll)
        f = jax.jit(lambda p, e, s, r, _ro=ro: _ro(p, e, s, r).transitions.reward)
        t = timeit(f, state.params, env_state, stats, rng, iters=cfg.iters)
        res[f"t_rollout_unroll{unroll}_ms"] = t * 1e3

    # --- update only (on a captured segment) ---
    ro = make_rollout_fn(env, algo.act_fn, cfg.T)
    seg = jax.jit(lambda p, e, s, r: ro(p, e, s, r))(
        state.params, env_state, stats, rng)
    jax.block_until_ready(seg.transitions.obs)

    upd = jax.jit(lambda st, tr, mc, ne, r: algo.update(st, tr, mc, ne, r)[0])
    t_upd = timeit(upd, state, seg.transitions, seg.stats.mean_cost,
                   seg.stats.n_episodes, rng, iters=cfg.iters)
    res["t_update_ms"] = t_upd * 1e3

    # --- full fused iteration, unroll sweep ---
    def make_full(unroll):
        r = make_rollout_fn(env, algo.act_fn, cfg.T, unroll=unroll)

        @jax.jit
        def full(state, env_state, stats, rng):
            rng, k1, k2 = jax.random.split(rng, 3)
            out = r(state.params, env_state, stats.reset_aggregates(), k1)
            state, _ = algo.update(state, out.transitions,
                                   out.stats.mean_cost,
                                   out.stats.n_episodes, k2)
            return state, out.env_state, out.stats, rng

        return full

    for unroll in (1, 4):
        full = make_full(unroll)
        st, es, sts, rg = full(state, env_state, stats, rng)
        jax.block_until_ready(st.params)

        def run(st, es, sts, rg, _f=full):
            return _f(st, es, sts, rg)[0].params

        t = timeit(run, st, es, sts, rg, iters=cfg.iters)
        res[f"t_full_unroll{unroll}_ms"] = t * 1e3
        res[f"steps_per_s_unroll{unroll}"] = cfg.N * cfg.T / t

    # --- (N, T) shape sweep at constant N*T (rollout-only) ---
    res["shape_sweep"] = {}
    total = cfg.N * cfg.T
    for N2, T2 in ((cfg.N, cfg.T), (cfg.N * 2, cfg.T // 2),
                   (cfg.N * 4, cfg.T // 4)):
        if T2 < 4:
            continue
        es2 = env.reset_vec(rng, N2)
        st2 = EpisodeStats.init(N2, env.num_costs)
        ro2 = make_rollout_fn(env, algo.act_fn, T2, unroll=1)
        f2 = jax.jit(lambda p, e, s, r, _ro=ro2: _ro(p, e, s, r).transitions.reward)
        t = timeit(f2, state.params, es2, st2, rng, iters=cfg.iters)
        res["shape_sweep"][f"N{N2}_T{T2}"] = {
            "t_ms": round(t * 1e3, 2), "steps_per_s": round(total / t)}

    for k, v in res.items():
        if isinstance(v, float):
            res[k] = round(v, 3)
    print(json.dumps(res, indent=1))
    with open(cfg.out, "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
