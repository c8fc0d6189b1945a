"""Real-physics PointGoal1 benchmark: train on the raw-MuJoCo
reconstruction (``fsrl_tpu/envs/pointgoal_mj.py``) through the host path —
directly-comparable numbers for the reference's navigation suite
(``benchmark.rst:81-113``: PointGoal1 plateaus cvpo 24 / trpol 19.5 /
cpo 15.5 / ppol 14.5 / focops 10 at cost_limit 25).

Usage:
    JAX_PLATFORMS=cpu python benchmarks/run_pointgoal.py \
        --algos ppol,cpo --seeds 0 --budget 1000000
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from fsrl_tpu.config.cli import cli


@dataclass
class PGCfg:
    cost_limit: float = 25.0
    budget: int = 1000000
    step_per_epoch: int = 20000
    n_envs: int = 10
    steps_per_collect: int = 2000    # 20k-step collects (MujocoBaseCfg)
    episode_per_test: int = 4
    algos: str = "ppol,cpo"
    seeds: str = "0"
    outdir: str = "benchmarks/results_pointgoal"
    pid: str = "0.05,0.0005,0.1"


def run_one(cfg: PGCfg, key: str, seed: int) -> dict:
    from fsrl_tpu.algos.cpo import CPO
    from fsrl_tpu.algos.ppo_lag import PPOLag
    from fsrl_tpu.algos.trpo_lag import TRPOLag
    from fsrl_tpu.envs.pointgoal_mj import make_pointgoal_vector_env
    from fsrl_tpu.trainer.host_trainer import HostOnpolicyTrainer

    venv = make_pointgoal_vector_env(n_envs=cfg.n_envs)
    epochs = max(1, cfg.budget // cfg.step_per_epoch)
    nmb = max(1, (cfg.steps_per_collect * cfg.n_envs) // 256)
    gains = tuple(float(g) for g in cfg.pid.split(","))
    common = dict(cost_limit=cfg.cost_limit, episode_len=1000)
    if key == "ppol":
        algo = PPOLag(venv.observation_size, venv.action_size,
                      lagrangian_pid=gains, repeat=4, n_minibatches=nmb,
                      **common)
    elif key == "trpol":
        algo = TRPOLag(venv.observation_size, venv.action_size,
                       lagrangian_pid=gains, **common)
    elif key == "cpo":
        algo = CPO(venv.observation_size, venv.action_size, **common)
    else:
        raise ValueError(key)
    trainer = HostOnpolicyTrainer(
        algo, venv, epochs=epochs, step_per_epoch=cfg.step_per_epoch,
        steps_per_collect=cfg.steps_per_collect,
        episode_per_test=cfg.episode_per_test,
        cost_limit=cfg.cost_limit, seed=seed, verbose=False)

    curve = {"env_step": [], "reward": [], "cost": []}
    t0 = time.time()
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
        "algo": key, "task": "SafetyPointGoal1-MJ-v0", "seed": seed,
        "physics": "mujoco", "cost_limit": cfg.cost_limit,
        "budget": cfg.budget, "wall_s": wall,
        "steps_per_s": cfg.budget / wall,
        "final_reward": curve["reward"][-1], "final_cost": curve["cost"][-1],
        "best_reward": trainer.best_rew, "best_cost": trainer.best_cost,
        "curve": curve,
    }


@cli(PGCfg)
def main(cfg: PGCfg):
    os.makedirs(cfg.outdir, exist_ok=True)
    for key in cfg.algos.split(","):
        for seed in (int(s) for s in cfg.seeds.split(",")):
            out = os.path.join(cfg.outdir,
                               f"SafetyPointGoal1-MJ-v0-{key}-s{seed}.json")
            if os.path.exists(out):
                print(f"skip {key}/s{seed}")
                continue
            print(f"=== {key} seed {seed} PointGoal1-MJ ===", flush=True)
            res = run_one(cfg, key, seed)
            with open(out, "w") as f:
                json.dump(res, f)
            print(f"    best {res['best_reward']:.1f} @ cost "
                  f"{res['best_cost']:.1f}  ({res['wall_s']:.0f}s)",
                  flush=True)
    from make_summaries import summarize_dir
    summarize_dir(cfg.outdir)


if __name__ == "__main__":
    main()
