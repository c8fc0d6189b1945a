"""Diagnose the on-policy stall on SafetyDroneRun-v0 (env_fidelity rows
ppol 0.15x / cpo 0.30x / trpol 0.41x while cvpo/focops/sacl reach 1.0-1.6x).

Hypotheses probed, one short run each (CPU-friendly):
  A. baseline PPO-Lag                        -> reproduces the stall?
  B. unconstrained PPO (use_lagrangian off)  -> is the Lagrangian the cause,
                                                or does even pure PPO hover?
  C. bigger exploration (sigma_init)         -> exploration collapse?
  D. more optimization per batch (repeat=10) -> under-fitting the surrogate?

Usage: JAX_PLATFORMS=cpu python benchmarks/diag_drone.py --budget 200000
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from fsrl_tpu.config.cli import cli


@dataclass
class DiagCfg:
    task: str = "SafetyDroneRun-v0"
    budget: int = 200000
    variants: str = "A,B,C,D"
    seed: int = 0


@cli(DiagCfg)
def main(cfg: DiagCfg):
    from fsrl_tpu.agent import PPOLagAgent

    VARIANTS = {
        "A": {},
        "B": {"use_lagrangian": False},
        "C": {"sigma_init": 0.0},
        "D": {"repeat": 10},
    }
    for name in cfg.variants.split(","):
        kw = VARIANTS[name]
        t0 = time.time()
        agent = PPOLagAgent(cfg.task, cost_limit=25.0, seed=cfg.seed, **kw)
        agent.learn(
            epochs=max(1, cfg.budget // 20000), step_per_epoch=20000,
            n_envs=20, steps_per_collect=500, episode_per_test=10,
            verbose=False,
        )
        rew, length, cost = agent.evaluate(n_episodes=10, seed=1000)
        print(f"[{name}] {kw} -> final reward {rew:.1f} cost {cost:.1f} "
              f"len {length:.0f}  best {agent.trainer.best_rew:.1f}/"
              f"{agent.trainer.best_cost:.1f}  ({time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
