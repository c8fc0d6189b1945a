"""Diagnose CVPO's infeasible best checkpoints on the nav Button tasks
(round-3 verdict: Button1 best cost 140-207, Button2 119, Goal2 63 vs limit
25 — no feasible checkpoint all run, while on-policy families regulate fine
on the same envs).

Hypotheses separated by tracing the E-step internals per epoch:
  H1 dual saturation: estep_dual_max=20 was calibrated for the reference's
     ~25-scale episodic rewards; our nav analogs are ~100x denser, so the
     reward advantage inside `combined = q0 - lam*qc` can dwarf
     lam_max * dQc and the dual pins at 20 while cost stays high.
     Signature: lambda == dual_max for most of the run.
  H2 cost-critic underestimation: Qc(s,a) mean sits below qc_thres even
     though realized cost is 5x the limit. Signature: qc_mean < thres
     while test_cost >> limit, lambda near 0.
  H3 threshold miscalibration for dense cost sources.

Usage: JAX_PLATFORMS=cpu python benchmarks/diag_cvpo.py \
           --task SafetyPointButton1-v0 --budget 200000
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
    task: str = "SafetyPointButton1-v0"
    seed: int = 0
    budget: int = 200000
    cost_limit: float = 25.0
    step_per_epoch: int = 4000
    out: str = "benchmarks/diag_cvpo_trace.json"
    variant: str = ""   # algo overrides, e.g. "estep_dual_max=100"


@cli(DiagCfg)
def main(cfg: DiagCfg):
    from fsrl_tpu.agent import CVPOAgent
    from fsrl_tpu.trainer.trainer import OffpolicyTrainerTPU, decache

    kw = {}
    if cfg.variant:
        for item in cfg.variant.split(","):
            k, v = item.split("=")
            try:
                kw[k] = json.loads(v)
            except json.JSONDecodeError:
                kw[k] = v
    agent = CVPOAgent(cfg.task, cost_limit=cfg.cost_limit, seed=cfg.seed,
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

    @jax.jit
    def probe(state, buf_state):
        # Q scale on recent on-distribution states from the replay ring
        obs = jax.lax.dynamic_slice_in_dim(
            buf_state.data.obs.reshape(-1, env.observation_size), 0, 512)
        dist = algo.actor.apply(state.params["actor"], obs)
        a = dist.sample(jax.random.PRNGKey(7))
        q = jnp.min(algo.critics.apply(state.params["critics"], obs, a),
                    axis=-1)  # (B, K)
        return {"q0": q[:, 0].mean(), "qc": q[:, 1:].mean(),
                "qc_max": q[:, 1:].max(), "std": dist.std.mean()}

    print(f"qc_thres = {float(algo.qc_thres.sum()):.3f} "
          f"(coeff {algo._qc_coeff:.4f})", flush=True)
    trace = []
    t0 = time.time()
    for epoch, stats, info in trainer:
        st = trainer.state
        host = jax.device_get({
            "dual": st.estep_dual, "probe": probe(st, trainer.buf_state)})
        row = {
            "env_step": info["env_step"],
            "test_reward": info["test_reward"],
            "test_cost": info["test_cost"],
            "eta": float(host["dual"][0]),
            "lam": float(host["dual"][1:].sum()),
            "q0": float(host["probe"]["q0"]),
            "qc": float(host["probe"]["qc"]),
            "qc_max": float(host["probe"]["qc_max"]),
            "actor_std": float(host["probe"]["std"]),
        }
        trace.append(row)
        print(f"{row['env_step']:>7} rew {row['test_reward']:8.1f} "
              f"cost {row['test_cost']:7.1f} lam {row['lam']:7.3f} "
              f"eta {row['eta']:7.3f} q0 {row['q0']:9.1f} "
              f"qc {row['qc']:7.2f} (max {row['qc_max']:7.1f}) "
              f"std {row['actor_std']:5.3f}", flush=True)

    out = {"cfg": vars(cfg), "qc_thres": float(algo.qc_thres.sum()),
           "trace": trace, "wall_s": time.time() - t0}
    with open(cfg.out, "w") as f:
        json.dump(out, f)
    print(f"wrote {cfg.out} ({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
