"""Diagnose the trust-region stall on SafetyDroneRun-v0 (fidelity rows:
trpol 0.22x, cpo 0.41x, ddpgl 0.44x while ppol reaches ~1.0x post-dragfix).

Committed findings (CPU runs, seed 0, 500k-1M steps; see
docs/env_fidelity.md "Diagnosed cells"):

  A. target_kl sweep (5e-3 / 1e-2 / 2e-2): all constrained variants stall
     at best ~59-68 @ cost ~24 — NOT a trust-region-size problem.
  B. use_lagrangian=False: unconstrained TRPO reaches reward 3526 @ cost
     473 — the dynamics and the natural-gradient machinery are fine; the
     CONSTRAINT interaction is the stall.
  C. The committed 2M trpol curve decays monotonically to reward 7.5 @
     cost 0 with mean episode length 48: the policy converges to the
     degenerate feasible solution "crash immediately" (a dead drone pays
     no cost). The early infeasible phase (cost 344 at start) winds the
     multiplier up, the combined natural-gradient step walks toward the
     nearest cost reduction — crashing early — and the monotone
     trust-region (KL <= 0.005-0.02 per step, entropy decaying) never
     escapes that basin. PPO escapes via clipped stochastic updates +
     entropy (its curve dips to 71 at 1.26M and recovers to 688).
  D. Cost-limit annealing 300 -> 25 over the first half partially escapes
     (mid-run reward 3369; post-anneal oscillates ~110-144 @ cost ~35)
     but collapses back once the limit tightens: the feasible frontier
     navigation still fails under the monotone step rule.

Conclusion: the 0.22-0.44x DroneRun trust-region/deterministic cells are
an algorithm-class x env-structure interaction (crash-termination makes
"die fast" the nearest feasible point), not an env-dynamics defect (B) and
not a tuning defect (A). The reference's PyBullet drone has softer
crash behavior; its published trpol curve plateaus mid-tier.

ROUND-5 UPDATE (after the ground-floor alignment, fsrl_tpu/envs/drone.py —
ground is now a resting state, not an exit):

  E. SAC-Lag is FIXED by the alignment alone: best -11 -> 694 @ cost 0.6
     (1.85x the reference scale, 3 seeds in benchmarks/results_1m). The
     bang-bang "crash early, pay nothing" exit was the whole sacl failure.
  F. Trust-region still stalls, but the basin moved from "crash" to "hover
     still / sit grounded" (feasible, reward ~0-50). Probes on the aligned
     env, 1M each: sigma_floor=0.2 entropy floor (best 44.8@24.0, mid-run
     peak 72 then decay), softer PID 0.05/0.0005/0.1 (best 47.5@24.5),
     target_kl=0.02 (best 51.5@24.8) — all ~0.1x. The multiplier reacts
     faster than the monotone KL-bounded steps can coordinate
     tilt+thrust+speed near the constraint boundary, so the policy retreats
     to the v=0 interior optimum each oscillation. PPO's clipped stochastic
     updates (reward 491-700) and all off-policy learners escape it.
     Remaining as a documented limitation of the analog: the quadrotor
     attitude coupling makes the feasible boundary harder to ride than the
     reference's PyBullet drone.

Usage: JAX_PLATFORMS=cpu python benchmarks/diag_drone_trpol.py \
           --variants A,B --budget 500000
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from fsrl_tpu.config.cli import cli


@dataclass
class DiagCfg:
    task: str = "SafetyDroneRun-v0"
    budget: int = 500000
    variants: str = "A1,A2,A3,B"
    seed: int = 0


@cli(DiagCfg)
def main(cfg: DiagCfg):
    from fsrl_tpu.agent import TRPOLagAgent

    VARIANTS = {
        "A1": {"target_kl": 0.005},
        "A2": {"target_kl": 0.01},
        "A3": {"target_kl": 0.02},
        "B": {"target_kl": 0.01, "use_lagrangian": False},
    }
    for name in cfg.variants.split(","):
        kw = VARIANTS[name]
        t0 = time.time()
        agent = TRPOLagAgent(cfg.task, cost_limit=25.0, seed=cfg.seed, **kw)
        info = agent.learn(
            epochs=max(1, cfg.budget // 20000), step_per_epoch=20000,
            n_envs=20, steps_per_collect=500, episode_per_test=10,
            verbose=False,
        )
        print(f"[{name}] {kw} -> final {info['test_reward']:.0f}@"
              f"{info['test_cost']:.1f} best {info['best_reward']:.0f}@"
              f"{info['best_cost']:.1f} ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
