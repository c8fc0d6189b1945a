"""Learning-curve benchmark: run every algorithm on a task with a real cost
limit and record reward/cost curves — the reproduction of the reference's
benchmark protocol (3-seed curves, default configs,
``docs/tutorials/benchmark.rst``) scaled to the available budget.

Usage:
    python benchmarks/run_curves.py --task SafetyBallRun-v0 --budget 500000 \
        --algos ppol,trpol,cpo,focops --seeds 0,1,2 --outdir benchmarks/results

Writes one JSON per (algo, seed) with per-epoch test reward/cost, plus a
summary markdown table and (if matplotlib is present) curve PNGs.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass


from fsrl_tpu.agent import (CPOAgent, CVPOAgent, DDPGLagAgent, FOCOPSAgent,
                            PPOLagAgent, SACLagAgent, TRPOLagAgent)
from fsrl_tpu.config.cli import cli

AGENTS = {
    "ppol": (PPOLagAgent, True, {}),
    "trpol": (TRPOLagAgent, True, {"target_kl": 0.005}),
    "cpo": (CPOAgent, True, {}),
    "focops": (FOCOPSAgent, True, {}),
    # softer PID than the reference's DDPG default (0.5, 0.001, 0.1): our
    # 500-step episodes make the constraint error ~10x the reference env's
    # scale, and kp=0.5 then slams the multiplier into a feasible/infeasible
    # limit cycle (SAC's gains hold the cost at the limit cleanly)
    "ddpgl": (DDPGLagAgent, False, {"lagrangian_pid": (0.05, 0.0005, 0.1)}),
    "sacl": (SACLagAgent, False, {}),
    "cvpo": (CVPOAgent, False, {}),
}


@dataclass
class CurveCfg:
    task: str = "SafetyBallRun-v0"
    cost_limit: float = 25.0
    budget: int = 500000            # on-policy env-step budget
    off_budget: int = 150000        # off-policy env-step budget
    step_per_epoch: int = 10000
    n_envs: int = 20
    steps_per_collect: int = 500
    off_n_envs: int = 8
    off_steps_per_collect: int = 125
    # 10 fused cycles x 1000-step collects = one jitted dispatch per 10k
    # steps: essential when the TPU tunnel's per-dispatch latency dominates
    off_fuse_iters: int = 10
    episode_per_test: int = 10
    algos: str = "ppol,trpol,cpo,focops,ddpgl,sacl,cvpo"
    seeds: str = "0"
    outdir: str = "benchmarks/results"
    log_every: int = 5              # train-metric fetch cadence (collects)
    # optional PID override for the PID-Lagrangian on-policy algos
    # (ppol/trpol): "kp,ki,kd". The dense-cost nav "2" tasks need a stronger
    # integral than the Bullet default to reach the lambda equilibrium
    # in-budget (see /tmp-era gain sweep results in docs/nav_fidelity.md).
    pid_onpolicy: str = ""
    sigma_floor: float = 0.0
    qc_ucb: float = 0.0
    # optional FOCOPS nu ceiling override (0 = reference default 2.0) — the
    # same dense-reward scale argument: Goal2 needs nu beyond 2
    nu_max: float = 0.0


def run_one(cfg: CurveCfg, key: str, seed: int) -> dict:
    agent_cls, onpolicy, kw = AGENTS[key]
    budget = cfg.budget if onpolicy else cfg.off_budget
    epochs = max(1, budget // cfg.step_per_epoch)
    if cfg.pid_onpolicy and key in ("ppol", "trpol"):
        kw = dict(kw, lagrangian_pid=tuple(
            float(x) for x in cfg.pid_onpolicy.split(",")))
    if cfg.nu_max and key == "focops":
        kw = dict(kw, nu_max=cfg.nu_max)
    if cfg.qc_ucb and key == "sacl":
        # cost-Q head-disagreement pessimism (Button1 attractor attempt)
        kw = dict(kw, qc_ucb=cfg.qc_ucb)
    if cfg.sigma_floor and key in ("trpol", "cpo"):
        # entropy floor for the monotone trust-region family (documented
        # deviation; see fsrl_tpu/nets/mlp.py::GaussianActor.sigma_floor)
        kw = dict(kw, sigma_floor=cfg.sigma_floor)
    agent = agent_cls(cfg.task, cost_limit=cfg.cost_limit, seed=seed, **kw)
    curve = {"env_step": [], "reward": [], "cost": []}
    t0 = time.time()

    common = dict(
        epochs=epochs, step_per_epoch=cfg.step_per_epoch,
        episode_per_test=cfg.episode_per_test, verbose=False,
        log_every=cfg.log_every,
    )
    if onpolicy:
        common.update(n_envs=cfg.n_envs,
                      steps_per_collect=cfg.steps_per_collect)
    else:
        common.update(n_envs=cfg.off_n_envs,
                      steps_per_collect=cfg.off_steps_per_collect,
                      update_per_step=0.2, update_chunk=256,
                      fuse_iters=cfg.off_fuse_iters)

    # iterate the trainer manually so each epoch's test stats are recorded
    from fsrl_tpu.trainer.trainer import decache
    agent.learn_kwargs = common
    stop = None
    agent.trainer = None
    # reuse agent.learn wiring by constructing the trainer directly
    from fsrl_tpu.trainer.trainer import (OffpolicyTrainerTPU,
                                          OnpolicyTrainerTPU)
    tcls = OnpolicyTrainerTPU if onpolicy else OffpolicyTrainerTPU
    trainer = tcls(agent.algo, agent.env, agent.logger,
                   cost_limit=cfg.cost_limit, seed=seed, stop_fn=stop,
                   **common)
    trainer.state = decache(agent.state)
    for epoch, stats, info in trainer:
        curve["env_step"].append(info["env_step"])
        curve["reward"].append(info["test_reward"])
        curve["cost"].append(info["test_cost"])
    agent.state = trainer.state
    wall = time.time() - t0
    rew, length, cost = agent.evaluate(n_episodes=20, seed=seed + 1000)
    return {
        "algo": key, "task": cfg.task, "seed": seed,
        **({"pid": cfg.pid_onpolicy} if cfg.pid_onpolicy and
           key in ("ppol", "trpol") else {}),
        **({"nu_max": cfg.nu_max} if cfg.nu_max and key == "focops" else {}),
        **({"sigma_floor": cfg.sigma_floor} if cfg.sigma_floor and
           key in ("trpol", "cpo") else {}),
        **({"qc_ucb": cfg.qc_ucb} if cfg.qc_ucb and key == "sacl" else {}),
        "cost_limit": cfg.cost_limit, "budget": budget, "wall_s": wall,
        "n_envs": common["n_envs"],
        "steps_per_collect": common["steps_per_collect"],
        "step_per_epoch": cfg.step_per_epoch,
        "steps_per_s": budget / wall,
        "final_reward": rew, "final_cost": cost, "final_length": length,
        # feasibility-first best checkpoint (the reference's model-selection
        # rule, base_trainer.py:247-262) -- what a user would deploy
        "best_reward": float(trainer.best_rew),
        "best_cost": float(trainer.best_cost),
        "curve": curve,
    }


@cli(CurveCfg)
def main(cfg: CurveCfg):
    os.makedirs(cfg.outdir, exist_ok=True)
    rows = []
    for key in cfg.algos.split(","):
        for seed in (int(s) for s in cfg.seeds.split(",")):
            print(f"=== {key} seed {seed} on {cfg.task} ===", flush=True)
            res = None
            for attempt in range(3):   # remote-compile RPCs can be flaky
                try:
                    res = run_one(cfg, key, seed)
                    break
                except Exception as e:
                    print(f"    attempt {attempt}: {type(e).__name__}: "
                          f"{str(e)[:200]}", flush=True)
            if res is None:
                print(f"    SKIPPED {key}-s{seed} after 3 attempts", flush=True)
                continue
            path = os.path.join(cfg.outdir, f"{cfg.task}-{key}-s{seed}.json")
            with open(path, "w") as f:
                json.dump(res, f)
            rows.append(res)
            print(f"    reward {res['final_reward']:8.1f}  "
                  f"cost {res['final_cost']:6.1f} (limit {cfg.cost_limit})  "
                  f"{res['steps_per_s']:,.0f} steps/s  {res['wall_s']:.0f}s",
                  flush=True)

    # regenerate the whole directory's summaries from ALL result JSONs (not
    # just this invocation's rows) so one-cell-at-a-time grid scripts can
    # never leave a stale summary behind
    from make_summaries import summarize_dir
    summarize_dir(cfg.outdir)


if __name__ == "__main__":
    main()
