"""Diagnose SAC-Lag's late-training constraint divergence (round-3 verdict:
6 committed seeds end infeasible — e.g. SafetyBallRun-v0 s0 final cost 493.8
vs limit 25 — while the best checkpoint is feasible).

Reproduces the exact run_curves off-policy cadence (n_envs=8, T=125,
update_per_step=0.2) but with fine-grained epochs so the controller
internals are sampled every few thousand steps:

  per epoch -> test reward/cost, lambda, PID error integral, alpha,
  mean reward-Q and cost-Q over a fixed probe batch, train-side mean
  episodic cost.

Hypotheses this separates:
  H1 lambda limit cycle: integral winds up during the initial infeasible
     phase, crushes the policy to cost ~0 (far below the limit), then
     decays at -limit per PID step until lambda=0 and the actor drifts
     reward-greedy back into the infeasible region.
  H2 cost-critic staleness: after ~200k steps of cost~0 data the cost
     critic collapses to ~0 everywhere, so when cost spikes again
     lambda*Qc has no gradient until the critic re-learns (the visible
     "sudden" collapse).
  H3 Q/alpha numerical blowup (the round-3 alpha clamp's regime).

Usage: JAX_PLATFORMS=cpu python benchmarks/diag_sacl.py \
           --task SafetyBallRun-v0 --seed 0 --budget 300000
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from fsrl_tpu.config.cli import cli


@dataclass
class DiagCfg:
    task: str = "SafetyBallRun-v0"
    seed: int = 0
    budget: int = 300000
    cost_limit: float = 25.0
    step_per_epoch: int = 2500
    out: str = "benchmarks/diag_sacl_trace.json"
    # algo overrides under test, e.g. "integral_cap=200" (empty = baseline)
    variant: str = ""


@cli(DiagCfg)
def main(cfg: DiagCfg):
    from fsrl_tpu.agent import SACLagAgent
    from fsrl_tpu.trainer.trainer import OffpolicyTrainerTPU, decache

    kw = {}
    if cfg.variant:
        for item in cfg.variant.split(","):
            k, v = item.split("=")
            try:
                kw[k] = json.loads(v)
            except json.JSONDecodeError:
                kw[k] = v
    agent = SACLagAgent(cfg.task, cost_limit=cfg.cost_limit, seed=cfg.seed,
                        **kw)
    algo, env = agent.algo, agent.env
    trainer = OffpolicyTrainerTPU(
        algo, env, agent.logger,
        epochs=max(1, cfg.budget // cfg.step_per_epoch),
        step_per_epoch=cfg.step_per_epoch, n_envs=8, steps_per_collect=125,
        episode_per_test=10, cost_limit=cfg.cost_limit,
        update_per_step=0.2, seed=cfg.seed, verbose=False, log_every=5,
    )
    trainer.state = decache(agent.state)

    # fixed probe batch: Q scale over a stable reference set of states
    probe_rng = jax.random.PRNGKey(123)
    probe_obs = jax.random.normal(
        probe_rng, (256, env.observation_size)) * 0.5

    @jax.jit
    def probe(state):
        dist = algo._dist(state.params["actor"], probe_obs)
        a, _ = dist.sample_and_log_prob(probe_rng)
        q = jnp.min(algo.critics.apply(state.params["critics"], probe_obs, a),
                    axis=-1)  # (B, K)
        return {"q_rew": q[:, 0].mean(), "q_cost": q[:, 1:].mean(),
                "q_rew_max": jnp.abs(q[:, 0]).max(),
                "actor_std": dist.std.mean()}

    trace = []
    t0 = time.time()
    for epoch, stats, info in trainer:
        st = trainer.state
        host = jax.device_get({
            "lam": st.lag.multiplier, "integ": st.lag.error_integral,
            "err_old": st.lag.error_old,
            "alpha": jnp.exp(st.log_alpha), "last_ep_cost": st.last_ep_cost,
            "probe": probe(st),
        })
        row = {
            "env_step": info["env_step"],
            "test_reward": info["test_reward"],
            "test_cost": info["test_cost"],
            "lam": float(host["lam"].sum()),
            "integral": float(host["integ"].sum()),
            "err_old": float(host["err_old"].sum()),
            "alpha": float(host["alpha"]),
            "last_ep_cost": float(host["last_ep_cost"].sum()),
            "q_rew": float(host["probe"]["q_rew"]),
            "q_cost": float(host["probe"]["q_cost"]),
            "q_rew_max": float(host["probe"]["q_rew_max"]),
            "actor_std": float(host["probe"]["actor_std"]),
            "train_cost": float(stats.get("train/cost", float("nan"))),
        }
        trace.append(row)
        print(f"{row['env_step']:>7} rew {row['test_reward']:8.1f} "
              f"cost {row['test_cost']:7.1f} lam {row['lam']:8.3f} "
              f"I {row['integral']:9.1f} a {row['alpha']:7.4f} "
              f"qR {row['q_rew']:9.1f} qC {row['q_cost']:8.1f} "
              f"std {row['actor_std']:6.3f}", flush=True)

    out = {"cfg": vars(cfg), "trace": trace, "wall_s": time.time() - t0}
    with open(cfg.out, "w") as f:
        json.dump(out, f)
    print(f"wrote {cfg.out} ({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
