"""Real-physics benchmark: train on Safety-Gymnasium-style MuJoCo velocity
tasks through the host-environment path (true MuJoCo dynamics, jitted
learner) and record reward/cost curves — the reproduction of the reference's
velocity-suite protocol (``docs/tutorials/benchmark.rst:47-78``, 5 tasks,
cost_limit 25).

This is the framework's real-dynamics parity evidence: unlike the JAX Bullet
analogs, these environments are NOT self-made.

Usage:
    python benchmarks/run_velocity.py --task SafetyHalfCheetahVelocity-v1 \
        --algos ppol,sacl --budget 1000000 --seeds 0 --outdir benchmarks/results_velocity
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from fsrl_tpu.config.cli import cli


@dataclass
class VelCurveCfg:
    task: str = "SafetyHalfCheetahVelocity-v1"
    cost_limit: float = 25.0
    budget: int = 1000000           # on-policy env-step budget
    off_budget: int = 300000        # off-policy env-step budget
    step_per_epoch: int = 20000
    n_envs: int = 10
    # 2000 host steps x 10 envs = one 20k-step collect — the reference's
    # MujocoBaseCfg protocol (episode_per_collect=20 x 1000-step episodes,
    # ppol_cfg.py:87-94). Smaller collects under-optimize per datum (the
    # tianshou schedule takes ~312 grad steps of batch 256 per 20k collect)
    # and let reward outrun the Lagrangian response: the 5M HalfCheetah run
    # at 5k collects / 16 grad steps saw cost blow through 25 to 165.
    steps_per_collect: int = 2000
    off_n_envs: int = 4
    off_steps_per_collect: int = 100
    episode_per_test: int = 4
    algos: str = "ppol,sacl"
    seeds: str = "0"
    outdir: str = "benchmarks/results_velocity"
    # PID gains for the on-policy run; velocity episodes are 1000 steps with
    # cost scales ~10x the Bullet analogs, so the default Bullet gains leave
    # a steady-state violation -- a stronger integral removes it
    pid: str = "0.05,0.0005,0.1"


def run_one(cfg: VelCurveCfg, key: str, seed: int) -> dict:
    from fsrl_tpu.algos.cpo import CPO
    from fsrl_tpu.algos.cvpo import CVPO
    from fsrl_tpu.algos.ddpg_lag import DDPGLag
    from fsrl_tpu.algos.focops import FOCOPS
    from fsrl_tpu.algos.ppo_lag import PPOLag
    from fsrl_tpu.algos.sac_lag import SACLag
    from fsrl_tpu.algos.trpo_lag import TRPOLag
    from fsrl_tpu.envs.velocity import make_velocity_vector_env
    from fsrl_tpu.trainer.host_trainer import (HostOffpolicyTrainer,
                                               HostOnpolicyTrainer)

    onpolicy = key in ("ppol", "trpol", "cpo", "focops")
    budget = cfg.budget if onpolicy else cfg.off_budget
    n_envs = cfg.n_envs if onpolicy else cfg.off_n_envs
    venv = make_velocity_vector_env(cfg.task, n_envs=n_envs)
    epochs = max(1, budget // cfg.step_per_epoch)
    t0 = time.time()
    if onpolicy:
        gains = tuple(float(g) for g in cfg.pid.split(","))
        # reference minibatching: batch_size 256 over the 20k collect,
        # repeat 4 -> ~312 grad steps per collect (ppol_cfg.py:44-49)
        nmb = max(1, (cfg.steps_per_collect * cfg.n_envs) // 256)
        common = dict(cost_limit=cfg.cost_limit, episode_len=1000)
        if key == "ppol":
            algo = PPOLag(venv.observation_size, venv.action_size,
                          lagrangian_pid=gains, repeat=4, n_minibatches=nmb,
                          **common)
        elif key == "trpol":
            # repeat=4: the reference's MujocoBaseCfg repeat_per_collect
            # (trpol_cfg.py:92) — one TR step per 20k collect starves the
            # natural-gradient family (50 updates of KL<=target per 1M steps)
            algo = TRPOLag(venv.observation_size, venv.action_size,
                           lagrangian_pid=gains, repeat=4, **common)
        elif key == "cpo":
            algo = CPO(venv.observation_size, venv.action_size, repeat=4,
                       **common)
        else:
            algo = FOCOPS(venv.observation_size, venv.action_size,
                          repeat=4, n_minibatches=nmb, **common)
        trainer = HostOnpolicyTrainer(
            algo, venv, epochs=epochs, step_per_epoch=cfg.step_per_epoch,
            steps_per_collect=cfg.steps_per_collect,
            episode_per_test=cfg.episode_per_test,
            cost_limit=cfg.cost_limit, seed=seed, verbose=False)
    else:
        if key == "sacl":
            algo = SACLag(venv.observation_size, venv.action_size,
                          cost_limit=cfg.cost_limit)
        elif key == "ddpgl":
            algo = DDPGLag(venv.observation_size, venv.action_size,
                           cost_limit=cfg.cost_limit)
        else:
            algo = CVPO(venv.observation_size, venv.action_size,
                        cost_limit=cfg.cost_limit, max_episode_steps=1000)
        trainer = HostOffpolicyTrainer(
            algo, venv, epochs=epochs, step_per_epoch=cfg.step_per_epoch,
            steps_per_collect=cfg.off_steps_per_collect,
            episode_per_test=cfg.episode_per_test,
            cost_limit=cfg.cost_limit, seed=seed, verbose=False)

    curve = {"env_step": [], "reward": [], "cost": []}
    for epoch, stats, info in trainer:
        curve["env_step"].append(info["env_step"])
        curve["reward"].append(info["test_reward"])
        curve["cost"].append(info["test_cost"])
        print(f"  epoch {epoch}/{epochs} step {info['env_step']} "
              f"rew {info['test_reward']:.1f} cost {info['test_cost']:.1f} "
              f"({info['speed']:,.0f} st/s)", flush=True)
    wall = time.time() - t0
    venv.close()
    return {
        "algo": key, "task": cfg.task, "seed": seed, "physics": "mujoco",
        "cost_limit": cfg.cost_limit, "budget": budget, "wall_s": wall,
        "steps_per_s": budget / wall,
        "final_reward": curve["reward"][-1], "final_cost": curve["cost"][-1],
        "best_reward": trainer.best_rew, "best_cost": trainer.best_cost,
        "curve": curve,
    }


@cli(VelCurveCfg)
def main(cfg: VelCurveCfg):
    os.makedirs(cfg.outdir, exist_ok=True)
    rows = []
    for key in cfg.algos.split(","):
        for seed in (int(s) for s in cfg.seeds.split(",")):
            print(f"=== {key} seed {seed} on {cfg.task} ===", flush=True)
            res = run_one(cfg, key, seed)
            tag = "" if cfg.pid == "0.05,0.0005,0.1" or \
                key not in ("ppol", "trpol") \
                else "-pid" + cfg.pid.replace(",", "_")
            path = os.path.join(cfg.outdir,
                                f"{cfg.task}-{key}{tag}-s{seed}.json")
            with open(path, "w") as f:
                json.dump(res, f)
            rows.append(res)
            print(f"    reward {res['final_reward']:8.1f}  "
                  f"cost {res['final_cost']:6.1f} (limit {cfg.cost_limit})  "
                  f"{res['steps_per_s']:,.0f} steps/s  {res['wall_s']:.0f}s",
                  flush=True)

    # regenerate ALL summaries in the outdir (stale-summary guard,
    # tests/test_summaries.py)
    from make_summaries import summarize_dir
    summarize_dir(cfg.outdir)


if __name__ == "__main__":
    main()
