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

ROUND-5 RESOLUTION (fsrl_tpu/envs/drone.py):

  E. Ground-floor variant (ground = resting state, no exit): FIXED sacl
     outright (best -11 -> 694-711, 3/3 feasible) and let cpo escape on
     2/3 seeds — but STARVED the on-policy family: with no termination a
     crashed drone wallows grounded, on-policy learners lose their
     airborne sample concentration and ppol/focops fell to ~0.1x (bests
     44-58 across grounded-penalty 1.0/0.1 and an elastic-bounce variant,
     2M-5M probes; results archived in results_archive/r5_floor_variants).
  F. Entropy floor (sigma>=0.2), softer PID, target_kl=0.02 on the floor
     variant: all flat (~44-52) — not an exploration-size problem.
  G. FINAL SEMANTICS — crash-termination RESTORED + the crash charged to
     the COST channel at the suite limit (CRASH_COST=25): a crashed
     episode is never feasible, so the die-fast basin is removed BY
     CONSTRUCTION while termination keeps on-policy samples airborne.
     2M probes: trpol best 720 @ cost 23 (from 0.22x to ~1.6x reference
     scale), ppol 713 @ 9. Full 7x3 grid re-run in results_1m.
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
