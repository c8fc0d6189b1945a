"""Round-5 experiment log: decompose the 20.5 ms update phase (93% of the
fused PPO-Lag iteration, ``bench_phases.json``) into its parts and measure
each optimization lever separately.

The update at (N, T) = (4096, 64), repeat 4, 8 minibatches is 32 sequential
grad steps; the roofline says compute is ~0.25 ms, so nearly everything is
intra-program serialization of small ops. Measured components:

    t_gradstep      one jitted grad step on a fixed 32k minibatch
    t_mbscan        8-minibatch scan, shuffle excluded (pre-packed input)
    t_shuffle       minibatch_scan with an identity body (pack+gather only)
    t_gae           process_rollout alone
    t_update        the full update (baseline)

Levers (each measured against the SAME baseline program):

    unroll          lax.scan unroll in the minibatch + epoch scans
    flat_opt        optax.flatten around the optimizer (one fused vector
                    Adam instead of ~50 per-leaf elementwise HLOs per step)
    epoch_select    KL-stop select_tree at epoch granularity instead of per
                    minibatch step

Usage:  python benchmarks/bench_update_breakdown.py        # on the TPU
        JAX_PLATFORMS=cpu python ... --small 1             # smoke
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from fsrl_tpu.config.cli import cli


@dataclass
class BreakCfg:
    N: int = 4096
    T: int = 64
    iters: int = 20
    small: int = 0
    out: str = "benchmarks/bench_update_breakdown.json"


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


@cli(BreakCfg)
def main(cfg: BreakCfg):
    from fsrl_tpu.algos.common import process_rollout
    from fsrl_tpu.algos.ppo_lag import PPOLag
    from fsrl_tpu.data.collector import make_rollout_fn
    from fsrl_tpu.envs import make
    from fsrl_tpu.types import EpisodeStats, minibatch_scan

    if cfg.small:
        cfg.N, cfg.T, cfg.iters = 256, 16, 3
    env = make("SafetyCarCircle-v0")
    algo = PPOLag(env.observation_size, env.action_size, cost_limit=10.0,
                  repeat=4, n_minibatches=8, compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    state = algo.init(rng)
    env_state = env.reset_vec(rng, cfg.N)
    stats = EpisodeStats.init(cfg.N, env.num_costs)
    ro = make_rollout_fn(env, algo.act_fn, cfg.T)
    seg = jax.jit(ro)(state.params, env_state, stats, rng)
    jax.block_until_ready(seg.transitions.obs)
    tr = seg.transitions
    res = {"N": cfg.N, "T": cfg.T}

    # --- baseline update ---
    upd = jax.jit(lambda st, r: algo.update(
        st, tr, seg.stats.mean_cost, seg.stats.n_episodes, r)[0])
    res["t_update_ms"] = timeit(upd, state, rng, iters=cfg.iters) * 1e3

    # --- GAE / process_rollout alone ---
    gae = jax.jit(lambda p: process_rollout(
        lambda pp, o: algo.critics.apply(pp["critics"], o), p, tr,
        0.99, 0.95).adv)
    res["t_gae_ms"] = timeit(gae, state.params, iters=cfg.iters) * 1e3

    # --- one grad step on a fixed minibatch ---
    batch = jax.jit(lambda p: process_rollout(
        lambda pp, o: algo.critics.apply(pp["critics"], o), p, tr, 0.99, 0.95))(
            state.params)
    jax.block_until_ready(batch.obs)
    B = batch.obs.shape[0] // algo.hp["n_minibatches"]
    mb = jax.tree.map(lambda x: x[:B], batch)

    def one_step(params, opt_state, mb):
        def loss_fn(p):
            dist = algo.actor.apply(p["actor"], mb.obs)
            log_p = dist.log_prob(mb.act)
            ratio = jnp.exp(log_p - mb.logp_old)
            adv = (mb.adv - mb.adv.mean(0)) / (mb.adv.std(0) + 1e-8)
            surr = -jnp.mean(jnp.minimum(
                ratio * adv[:, 0],
                jnp.clip(ratio, 0.8, 1.2) * adv[:, 0]))
            v = algo.critics.apply(p["critics"], mb.obs)
            vf = jnp.sum(jnp.mean((mb.ret - v) ** 2, axis=0))
            return surr + 0.25 * vf
        import optax
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = algo.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    step_j = jax.jit(one_step)
    o0 = algo.tx.init(state.params)
    res["t_gradstep_ms"] = timeit(
        step_j, state.params, o0, mb, iters=cfg.iters) * 1e3

    # --- minibatch scan without shuffle: scan one_step over 8 fixed mbs ---
    mbs = jax.tree.map(
        lambda x: x[: (x.shape[0] // B) * B].reshape(
            (algo.hp["n_minibatches"], B) + x.shape[1:]), batch)

    def scan_steps(params, opt_state, unroll):
        def body(c, mb):
            p, o = c
            p, o = one_step(p, o, mb)
            return (p, o), None
        (p, o), _ = jax.lax.scan(body, (params, opt_state), mbs,
                                 unroll=unroll)
        return p

    for unroll in (1, 8):
        f = jax.jit(lambda p, o, u=unroll: scan_steps(p, o, u))
        res[f"t_mbscan8_unroll{unroll}_ms"] = timeit(
            f, state.params, o0, iters=cfg.iters) * 1e3

    # --- shuffle cost: minibatch_scan with identity body ---
    shuf = jax.jit(lambda r: minibatch_scan(
        r, batch, algo.hp["n_minibatches"],
        lambda c, mb: (c + jnp.mean(mb.adv), None), jnp.zeros(()))[0])
    res["t_shuffle_ms"] = timeit(shuf, rng, iters=cfg.iters) * 1e3

    # --- flat (fused-vector) optimizer variant of the grad step ---
    import optax
    flat_tx = optax.flatten(optax.chain(
        optax.clip_by_global_norm(0.5), optax.adam(5e-4)))
    fo0 = flat_tx.init(state.params)

    def one_step_flat(params, opt_state, mb):
        def loss_fn(p):
            dist = algo.actor.apply(p["actor"], mb.obs)
            log_p = dist.log_prob(mb.act)
            ratio = jnp.exp(log_p - mb.logp_old)
            adv = (mb.adv - mb.adv.mean(0)) / (mb.adv.std(0) + 1e-8)
            surr = -jnp.mean(jnp.minimum(
                ratio * adv[:, 0],
                jnp.clip(ratio, 0.8, 1.2) * adv[:, 0]))
            v = algo.critics.apply(p["critics"], mb.obs)
            vf = jnp.sum(jnp.mean((mb.ret - v) ** 2, axis=0))
            return surr + 0.25 * vf
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = flat_tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    res["t_gradstep_flatopt_ms"] = timeit(
        jax.jit(one_step_flat), state.params, fo0, mb,
        iters=cfg.iters) * 1e3

    def scan_steps_flat(params, opt_state, unroll):
        def body(c, mb):
            p, o = c
            p, o = one_step_flat(p, o, mb)
            return (p, o), None
        (p, o), _ = jax.lax.scan(body, (params, opt_state), mbs,
                                 unroll=unroll)
        return p

    for unroll in (1, 8):
        f = jax.jit(lambda p, o, u=unroll: scan_steps_flat(p, o, u))
        res[f"t_mbscan8_flat_unroll{unroll}_ms"] = timeit(
            f, state.params, fo0, iters=cfg.iters) * 1e3

    for k, v in list(res.items()):
        if isinstance(v, float):
            res[k] = round(v, 3)
    print(json.dumps(res, indent=1))
    with open(cfg.out, "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
