"""Quantified environment-fidelity report: JAX analog tasks vs the
reference's published Bullet-Safety-Gym results.

The JAX environments are re-derivations (point-mass/rigid-body dynamics
written for on-device rollout), NOT ports of PyBullet, so "matches the
reference" cannot mean bit-identical returns. What CAN be measured:

1. Reward scale: the steady-state reward each algorithm family reaches on
   our analog vs the plateau in the reference's published 3-seed curves
   (``/root/reference/docs/_static/images/bullet/*.png``,
   ``docs/tutorials/benchmark.rst:14-44``; values read off the plots).
2. Constraint pressure: does an unconstrained policy violate the limit by a
   comparable factor (i.e. is the safety trade-off real in both)?
3. Qualitative ordering: do the same algorithm families solve the task, and
   does the cost curve get regulated to the limit?

Usage (writes docs/env_fidelity.md):
    python benchmarks/env_fidelity.py --results benchmarks/results_1m,benchmarks/results
"""

from __future__ import annotations

import glob
import json
import os
from collections import defaultdict
from dataclasses import dataclass

from fsrl_tpu.config.cli import cli

# Steady-state train/reward plateaus read from the reference's published
# curve images (3-seed means, default configs, cost_limit 10). Source:
# /root/reference/docs/_static/images/bullet/<task>-reward.png; budgets from
# the x-axis extent of each plot.
REFERENCE_PLATEAUS = {
    "SafetyBallRun-v0": dict(
        budget="500k", best={"ddpgl": 800, "trpol": 460, "cpo": 460,
                             "cvpo": 440, "focops": 420, "ppol": 410,
                             "sacl": 450}),
    "SafetyBallCircle-v0": dict(
        budget="800k", best={"ddpgl": 780, "cvpo": 690, "sacl": 670,
                             "trpol": 620, "cpo": 590, "focops": 550,
                             "ppol": 500}),
    "SafetyCarRun-v0": dict(
        budget="300k", best={"trpol": 575, "cvpo": 550, "cpo": 550,
                             "ddpgl": 540, "sacl": 540, "focops": 545,
                             "ppol": 505}),
    "SafetyCarCircle-v0": dict(
        budget="1.5M", best={"cvpo": 430, "trpol": 430, "cpo": 420,
                             "ddpgl": 415, "ppol": 395, "sacl": 335,
                             "focops": 325}),
    "SafetyDroneRun-v0": dict(
        budget="1.5M", best={"trpol": 450, "cvpo": 440, "ppol": 440,
                             "focops": 430, "cpo": 420, "ddpgl": 395,
                             "sacl": 375}),
    "SafetyDroneCircle-v0": dict(
        budget="4M", best={"sacl": 690, "cvpo": 610, "trpol": 610,
                           "ddpgl": 540, "focops": 570, "ppol": 480,
                           "cpo": 370}),
    "SafetyAntRun-v0": dict(
        budget="2.5M", best={"cvpo": 700, "sacl": 690, "ddpgl": 690,
                             "trpol": 660, "focops": 630, "ppol": 620,
                             "cpo": 590}),
}


@dataclass
class FidCfg:
    results: str = "benchmarks/results_5m,benchmarks/results_1m,benchmarks/results"
    out: str = "docs/env_fidelity.md"


@cli(FidCfg)
def main(cfg: FidCfg):
    ours: dict = defaultdict(dict)   # task -> algo -> list of result tuples
    for d in cfg.results.split(","):
        for f in glob.glob(os.path.join(d, "*.json")):
            try:
                r = json.load(open(f))
            except Exception:
                continue
            if not isinstance(r, dict) or "algo" not in r:
                continue
            task = r["task"]
            # Deploy rule: quote the feasibility-first best test checkpoint
            # (the reference's own model-selection rule,
            # base_trainer.py:247-262) when the run recorded one; Lagrangian
            # methods oscillate, so "final" can catch a run mid-violation.
            # Old JSONs (pre best-tracking) fall back to the final eval.
            rew = r.get("best_reward", r["final_reward"])
            cost = r.get("best_cost", r["final_cost"])
            ours[task].setdefault(r["algo"], []).append(
                (rew, cost, r["budget"], "best_reward" in r))

    lines = [
        "# Environment fidelity: JAX analogs vs Bullet-Safety-Gym",
        "",
        "The on-device environments (`fsrl_tpu/envs/`) are re-derivations of",
        "the Bullet-Safety-Gym task *semantics* (agent families x Run/Circle",
        "objectives with the same reward/cost structure), not ports of the",
        "PyBullet physics. This report quantifies how the analogs compare to",
        "the reference's published results so that 'matches the task",
        "semantics' is a measured claim (reference curve plateaus read from",
        "`docs/_static/images/bullet/*.png`, 3-seed means, cost_limit 10;",
        "our numbers from `benchmarks/results*/` JSONs, cost_limit 25,",
        "quoting each run's feasibility-first BEST test checkpoint — the",
        "deploy rule — falling back to the final eval for old JSONs).",
        "The reference publishes Bullet curves for exactly these 7 tasks",
        "(`benchmark.rst:18-26` dropdown; AntCircle has no published curve).",
        "",
        "Real-physics ground truth lives in `benchmarks/results_velocity/`:",
        "the same learner trained on REAL MuJoCo velocity tasks through the",
        "host-env path reaches reference-scale rewards with the cost",
        "regulated to the limit — see `summary-*.md` there.",
        "",
        "| task | algo | reference plateau (limit 10) | ours (limit 25) | "
        "scale ratio |",
        "|---|---|---|---|---|",
    ]
    for task, ref in REFERENCE_PLATEAUS.items():
        for algo, ref_val in ref["best"].items():
            if algo not in ours.get(task, {}):
                continue
            # the reference plateau is read at the reference's FULL budget,
            # so compare against our largest-budget runs only — pooling a
            # 500k warmup run with a 2M converged run reports neither
            vals = ours[task][algo]
            top_budget = max(v[2] for v in vals)
            vals = [v for v in vals if v[2] == top_budget]
            # among equal-budget runs, best-tracked JSONs supersede legacy
            # final-only ones (re-runs of pre-best-tracking cells)
            if any(v[3] for v in vals):
                vals = [v for v in vals if v[3]]
            mean_r = sum(v[0] for v in vals) / len(vals)
            mean_c = sum(v[1] for v in vals) / len(vals)
            lines.append(
                f"| {task} | {algo} | ~{ref_val} @ {ref['budget']} | "
                f"{mean_r:.0f} (cost {mean_c:.0f}, n={len(vals)}) | "
                f"{mean_r / ref_val:.2f}x |")
    lines += [
        "",
        "## Reading the table",
        "",
        "- **Scale ratios cluster per task, not per algorithm** — the analogs",
        "  preserve relative algorithm behavior while the absolute reward",
        "  scale differs by a task-specific constant (dynamics-derived).",
        "- Circle tasks score higher here than in Bullet mostly because the",
        "  cost limit differs (25 vs 10): a looser limit permits more of the",
        "  high-speed orbit that earns reward.",
        "- The qualitative checks that matter for safe-RL research hold on",
        "  every task: unconstrained policies violate the limit by 3-10x",
        "  (constraint pressure is real), Lagrangian/trust-region methods",
        "  regulate the cost to the limit, and the reward ordering between",
        "  algorithm families is broadly preserved.",
        "",
        "## Diagnosed cells (committed analyses for sub-0.8x rows)",
        "",
        "- **DroneRun trust-region stall + sacl long-horizon bang-bang**:",
        "  DroneRun's constrained landscape has a degenerate feasible point",
        "  ('crash immediately': episode length ~20-48, cost 0, reward",
        "  ~-11..8 — a dead drone pays no episodic cost), a reward-optimal",
        "  INFEASIBLE basin (unconstrained TRPO: 3526 @ cost 473), and a",
        "  narrow feasible flight ridge between them (ppol holds 688@6",
        "  stably; ddpgl/cvpo reach ~580-726 feasible at 1M). trpol/cpo's",
        "  monotone natural-gradient step walks into the crash basin and",
        "  never escapes (target_kl sweeps flat, annealing escapes only",
        "  transiently — `benchmarks/diag_drone_trpol.py`). sacl at 1M",
        "  BANG-BANGS between the two basins (committed curves alternate",
        "  3500@477 and -11@0 with no stable intermediate, all 3 seeds),",
        "  so its largest-budget rows quote the crash point even though",
        "  the 300k tier caught feasible flight (best 540@0) mid-",
        "  transition: the analog's near-binary episodic cost (477 or 0)",
        "  gives the Q-driven controller no gradient along the ridge.",
        "  **ROUND-5 RESOLUTION — crash-cost semantics** (`envs/drone.py`):",
        "  crashing now charges the COST channel at the suite limit",
        "  (CRASH_COST=25), so a crashed episode is never feasible and the",
        "  die-fast basin is removed BY CONSTRUCTION, while",
        "  crash-termination itself is kept (a non-terminating floor",
        "  variant fixed sacl/cpo but starved on-policy learners of",
        "  airborne samples — ppol/focops fell to ~0.1x; all probes and",
        "  the full variant-comparison record are in",
        "  `diag_drone_trpol.py` E-G and `results_archive/`). Probes on",
        "  the final semantics: trpol 720@23 (0.22x -> ~1.6x), ppol",
        "  713@9; the full 7-algo x 3-seed grid below is measured on it.",
        "- **AntCircle budget note**: quoted at 5M (3 seeds, ppol/trpol",
        "  feasible at 755-1369 best) vs its 10M registry preset — the",
        "  reference publishes NO AntCircle curve (`benchmark.rst:18-26`),",
        "  so there is no plateau to match; the 10M tier was deprioritized",
        "  for cells with published comparisons.",
        "- **DroneCircle env-version note (r5)**: the DroneCircle rows",
        "  were measured before the crash-cost charge was added to the",
        "  Drone env (the change affects crash-heavy TRAINING phases;",
        "  DroneCircle's committed policies fly without crashing, and",
        "  fresh 5M-preset cells in results_5m supersede these rows as",
        "  they land). DroneRun rows are post-change.",
        "- **DroneCircle (RESOLVED)**: the round-3 sub-0.8x off-policy rows",
        "  were budget-limited (curves still rising at the 300k cutoff vs",
        "  the reference's 4M plateau). Budget-matched round-4 re-runs",
        "  under the hardened controller put ALL SEVEN algorithms at",
        "  0.98-2.26x the reference on this task (cpo 4M: 836; cvpo/sacl",
        "  1M: 996/940 vs plateaus 370-690), with best costs 3-22 vs",
        "  limit 25.",
        "- **AntRun ppol/focops/cpo (was 0.4-0.7x at n=3)**: the 5M seed",
        "  fills exposed one-in-three stall seeds (ppol s2 best 49@8.8,",
        "  focops s2 35@0 while sibling seeds reach 460+ feasible) — the",
        "  same crash-early degenerate-feasible interaction diagnosed on",
        "  DroneRun (`diag_drone_trpol.py`): Ant episodes terminate on",
        "  falling, so 'fall fast' is the nearest feasible point in the",
        "  early infeasible phase and some seeds never escape. trpol",
        "  (1.08x, 711-713 on ALL seeds) and sacl (1.01x) show the env",
        "  itself supports reference-scale feasible reward.",
        "  **ROUND-5 RESOLUTION — fall-cost semantics** (`envs/ant.py`):",
        "  falling now charges the COST channel at the suite limit",
        "  (FALL_COST=25), the same by-construction removal of the",
        "  die-fast basin that fixed DroneRun; pre-change on-policy",
        "  results are archived in `results_archive/pre_fallcost_ant/`",
        "  and the ppol/focops/cpo rows above are re-measured on the",
        "  aligned env (r5b tpu queue). Outcome: **cpo 0.68x -> ~1.0x**",
        "  (590-689 on s0/s1, 411 s2). ppol/focops retain a SEED LOTTERY",
        "  (ppol 624/620 on 2-of-5 seeds vs 34-168 stalls; focops",
        "  317-334 on 2-of-5 vs ~40 stalls): with die-fast closed, stall",
        "  seeds now converge to the stand-still feasible optimum",
        "  (reward ~35 @ cost 0 — upright, not walking). Gait discovery",
        "  on this paddling-contact model is exploration-hard for",
        "  KL-penalized first-order updates specifically; trust-region",
        "  (trpol 1.08x, cpo ~1.0x, ALL seeds) and off-policy",
        "  (1.01-1.04x) families are at reference scale on every seed.",
        "- **AntRun/AntCircle env-version note (r5)**: the remaining",
        "  trpol/sacl/ddpgl/cvpo AntRun rows and the AntCircle rows were",
        "  measured before the fall-cost charge (their committed policies",
        "  walk without falling, so eval behavior is unchanged; the change",
        "  affects fall-heavy TRAINING phases only).",
    ]
    os.makedirs(os.path.dirname(cfg.out), exist_ok=True)
    with open(cfg.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
