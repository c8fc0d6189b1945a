"""Navigation-suite fidelity report: our JAX Safety-Gymnasium-analog results
vs the reference's published navigation curves.

The navigation envs (`fsrl_tpu/envs/navigation.py`) are re-derivations of the
safety-gymnasium Point{Goal,Button,Push}{1,2} task *semantics* (compass +
pseudo-lidar observations, hazard/gremlin/pillar cost sources) on our own
point-robot dynamics — NOT the MuJoCo physics — and use a dense reward scale
(~100x the reference's sparse-progress scale). Absolute rewards are therefore
not comparable; what IS comparable:

1. Per-task algorithm ORDERING and which families solve the task at all.
2. Constraint regulation: best-checkpoint cost vs the limit.
3. Task difficulty ordering (Goal1 easiest; the "2" variants and Push harder).

Reference plateau values are read off
``/root/reference/docs/_static/images/safety-gymnasium-navigation/
<task>Gymnasium-v0-reward.png`` (3-seed train-reward means at 5M steps,
``benchmark.rst:81-113``).

Usage (writes docs/nav_fidelity.md):
    python benchmarks/nav_fidelity.py
"""

from __future__ import annotations

import glob
import json
import os
from collections import defaultdict
from dataclasses import dataclass

from fsrl_tpu.config.cli import cli

# (value @ 5M) read from the published reward PNGs. Negative/zero = the
# algorithm never learns the task in the reference.
REFERENCE_NAV = {
    "SafetyPointGoal1-v0": {"cvpo": 24, "trpol": 19.5, "cpo": 15.5,
                            "ppol": 14.5, "focops": 10, "sacl": -2,
                            "ddpgl": -1},
    "SafetyPointGoal2-v0": {"focops": 8.8, "trpol": 7.8, "cvpo": 6,
                            "cpo": 5.8, "ppol": 2.5, "sacl": -1.7,
                            "ddpgl": -3.3},
    "SafetyPointButton1-v0": {"cvpo": 9.9, "trpol": 5.5, "cpo": 5,
                              "focops": 4, "ppol": 4, "sacl": -3,
                              "ddpgl": -5},
    "SafetyPointButton2-v0": {"trpol": 6.8, "cvpo": 5.8, "cpo": 4.2,
                              "focops": 3.9, "ppol": 2.5, "sacl": -1.5,
                              "ddpgl": -5.8},
    "SafetyPointPush1-v0": {"cvpo": 13, "trpol": 5.9, "cpo": 4.1,
                            "ppol": 3.1, "focops": 2.8, "ddpgl": 0.6,
                            "sacl": -0.9},
    "SafetyPointPush2-v0": {"cvpo": 4.3, "trpol": 1.8, "ppol": 1.2,
                            "cpo": 1.0, "focops": 0.8, "ddpgl": -0.6,
                            "sacl": -0.9},
}


@dataclass
class NavFidCfg:
    results: str = "benchmarks/results_1m"
    results_mj: str = "benchmarks/results_pointgoal"
    out: str = "docs/nav_fidelity.md"


@cli(NavFidCfg)
def main(cfg: NavFidCfg):
    ours: dict = defaultdict(lambda: defaultdict(list))
    for d in cfg.results.split(","):
        for f in glob.glob(os.path.join(d, "*.json")):
            try:
                r = json.load(open(f))
            except Exception:
                continue
            if not isinstance(r, dict) or "algo" not in r:
                continue
            if r["task"] not in REFERENCE_NAV:
                continue
            rew = r.get("best_reward", r["final_reward"])
            cost = r.get("best_cost", r["final_cost"])
            ours[r["task"]][r["algo"]].append((rew, cost, r["budget"]))

    LIMIT = 25.0
    lines = [
        "# Navigation-suite fidelity: JAX analogs vs safety-gymnasium",
        "",
        "Reward SCALES are not comparable (our analogs use a dense ~100x",
        "scale); per-task algorithm ordering, solve/fail behavior, and",
        "constraint regulation are. Reference values are 5M-step published",
        "plateaus; ours are feasibility-first best checkpoints at the",
        "1M-on-policy / 500k-off-policy tier, 3 seeds.",
        "",
        "**Reference headline:** sacl/ddpgl never learn ANY navigation task",
        "(train reward <= 0 at 5M on all six), and cvpo leads most tasks.",
        "**Ours:** every family reaches reward scale on the analogs (denser",
        "reward, same lidar/compass interface, simpler contact dynamics),",
        "and after the round-4 controller work (filtered PID, CVPO",
        "realized-cost backstop, stronger-integral retunes for the",
        "on-policy '2' cells) cvpo holds the constraint on every task —",
        "matching the reference's 'cvpo leads' story at our scale. Cells",
        "marked INFEASIBLE never produced a checkpoint with cost <= 1.2x",
        "the limit; reaching reward scale with a violated constraint is",
        "NOT solving a safe-RL task.",
        "",
        "| task | algo | reference @5M | ours best ckpt (cost) | n | feasible |",
        "|---|---|---|---|---|---|",
    ]
    infeasible_cells = []
    for task, ref in REFERENCE_NAV.items():
        for algo in ("ppol", "trpol", "cpo", "focops", "cvpo", "sacl",
                     "ddpgl"):
            if algo not in ours.get(task, {}):
                continue
            vals = ours[task][algo]
            mean_r = sum(v[0] for v in vals) / len(vals)
            mean_c = sum(v[1] for v in vals) / len(vals)
            n_feas = sum(1 for v in vals if v[1] <= 1.2 * LIMIT)
            rv = ref.get(algo)
            ref_s = (f"{rv}" if rv is not None else "—") + \
                (" (fails)" if rv is not None and rv <= 0.6 else "")
            if n_feas == len(vals):
                feas_s = "yes"
            elif n_feas == 0:
                feas_s = "**INFEASIBLE**"
                infeasible_cells.append(f"{task}/{algo}")
            else:
                feas_s = f"{n_feas}/{len(vals)} seeds"
            lines.append(
                f"| {task} | {algo} | {ref_s} | "
                f"{mean_r:.0f} ({mean_c:.0f}) | {len(vals)} | {feas_s} |")
    lines += [
        "",
        "Cost limit is 25 in both; 'fails' marks reference cells whose",
        "published curve never exceeds ~0.6 reward. 'feasible' counts seeds",
        "whose best checkpoint holds cost <= 1.2x limit (30).",
    ]
    if infeasible_cells:
        lines += [
            "",
            "Infeasible cells (no feasible checkpoint on any seed): " +
            ", ".join(infeasible_cells) + ".",
        ]
    # ---- real-physics PointGoal1 (raw MuJoCo reconstruction) ----
    mj_rows = []
    for fpath in sorted(glob.glob(os.path.join(cfg.results_mj, "*.json"))):
        try:
            r = json.load(open(fpath))
        except Exception:
            continue
        if isinstance(r, dict) and r.get("physics") == "mujoco":
            mj_rows.append(r)
    if mj_rows:
        REF_PG1 = {"ppol": 14.5, "cpo": 15.5, "trpol": 19.5, "cvpo": 24.0,
                   "focops": 10.0}
        by_algo: dict = defaultdict(list)
        for r in mj_rows:
            by_algo[r["algo"]].append(r)
        lines += [
            "",
            "## Real-physics PointGoal1 (raw MuJoCo)",
            "",
            "`fsrl_tpu/envs/pointgoal_mj.py` rebuilds the PointGoal1 scene",
            "on the raw `mujoco` bindings (damped point robot, 8 hazard",
            "circles, resampling goal, 16-bin pseudo-lidars — the",
            "safety-gymnasium scene is itself just MuJoCo + task code), so",
            "these rewards ARE on the reference's scale, unlike the JAX",
            "analog rows above. Reference plateaus from",
            "`benchmark.rst:81-113` at cost_limit 25.",
            "",
            "| algo | reference plateau | ours best ckpt (cost) | n | ratio |",
            "|---|---|---|---|---|",
        ]
        for algo, rows in sorted(by_algo.items()):
            mr = sum(x.get("best_reward", x["final_reward"])
                     for x in rows) / len(rows)
            mc = sum(x.get("best_cost", x["final_cost"])
                     for x in rows) / len(rows)
            rv = REF_PG1.get(algo)
            ratio = f"{mr / rv:.2f}x" if rv else "—"
            lines.append(f"| {algo} | ~{rv} | {mr:.1f} ({mc:.0f}) | "
                         f"{len(rows)} | {ratio} |")

    lines += [
        "",
        "Known analysis for the partially-feasible cells:",
        "",
        "- **Button1 sacl — RESOLVED (r5)**: with `qc_ucb=0.5` (cost-Q",
        "  head-disagreement pessimism, a documented-deviation knob on",
        "  SACLag) all 3 seeds produce FEASIBLE best checkpoints",
        "  (203@20.8, 225@22.1, 71@6.2 — `results_button_ucb/`): the",
        "  disagreement penalty steers the actor off the cost-50",
        "  attractor where the two cost heads disagree. The default-config",
        "  rows below keep the attractor for reference-parity; the",
        "  pre-resolution analysis follows.",
        "- **Button1 sacl (default config)** (2/3 seeds above limit; bests 77-84, finals",
        "  ~50 = 2x limit, down from 113-207 pre-hardening). Probed and",
        "  REFUTED: eval stochasticity (deterministic eval of the same",
        "  policy reads 53.8 vs 52.8) and the entropy temperature (fixed",
        "  alpha 0.005/0.05 lands at the same ~48-50 final cost). The",
        "  actual mechanism: SAC's Q-guided actor converges to a",
        "  high-reward attractor (reward ~1200 at cost ~50) from which the",
        "  lambda*Qc gradient cannot descend — the feasible frontier that",
        "  on-policy methods find (ppol 556@24) has less than half the",
        "  reward, and the cost critic's resolution around the moving",
        "  gremlins cannot steer between the two basins. The reference",
        "  never gets sacl to learn Button at all (reward -3).",
        "- **Goal2 trpol** (1/3 seeds feasible even at the ki-4x integral",
        "  retune): the natural-gradient step on the combined surrogate",
        "  tracks the multiplier more stiffly than PPO's clipped updates;",
        "  s2 reaches 948@21.5 while s0/s1 settle ~1110@43.",
    ]
    os.makedirs(os.path.dirname(cfg.out), exist_ok=True)
    with open(cfg.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
