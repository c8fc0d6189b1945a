"""Velocity-suite fidelity report: our real-MuJoCo results vs the
reference's published Safety-Gymnasium velocity curves.

Unlike the Bullet analogs (re-derived JAX dynamics, see env_fidelity.py),
the velocity tasks run REAL MuJoCo through the host-env path, so reward
scales are directly comparable to the reference's published curves
(``/root/reference/docs/tutorials/benchmark.rst:47-78``; plateau values read
off ``docs/_static/images/safety-gymnasium-velocity/*-reward.png``, 3-seed
train-reward means, cost_limit 25).

Usage (writes docs/velocity_fidelity.md):
    python benchmarks/velocity_fidelity.py
"""

from __future__ import annotations

import glob
import json
import os
from collections import defaultdict
from dataclasses import dataclass

from fsrl_tpu.config.cli import cli

# Reference plateau (value, at_steps) read from the published reward PNGs.
# Budgets follow examples/mlp/train_ppol_agent.py:55-61 (5M base; Walker/Ant
# 10M+; sacl/ddpgl curves end earlier where the reference stopped them).
REFERENCE = {
    "SafetyHalfCheetahVelocity-v1": {
        "ppol": (1870, "5M"), "trpol": (2060, "5M"), "cpo": (1730, "5M"),
        "focops": (1070, "5M"), "cvpo": (1790, "5M"),
        "sacl": (2700, "5M"), "ddpgl": (2710, "5M"),
    },
    "SafetyHopperVelocity-v1": {
        "ppol": (1250, "5M"), "trpol": (1650, "5M"), "cpo": (1400, "5M"),
        "focops": (1460, "5M"), "cvpo": (1130, "5M"),
        "sacl": (1190, "5M"), "ddpgl": (1380, "5M"),
    },
    "SafetySwimmerVelocity-v1": {
        "ppol": (55, "5M"), "trpol": (52, "5M"), "cpo": (42, "5M"),
        "focops": (55, "5M"), "cvpo": (110, "5M"),
        "sacl": (47, "5M"), "ddpgl": (53, "5M"),
    },
    "SafetyAntVelocity-v1": {
        "ppol": (2800, "14M"), "trpol": (2850, "14M"), "cpo": (2600, "14M"),
        "focops": (2000, "15M"), "cvpo": (1700, "12M"),
        "sacl": (2600, "peak, collapses @10M"), "ddpgl": (2000, "10M"),
    },
    "SafetyWalker2dVelocity-v1": {
        "ppol": (2500, "15M"), "trpol": (3000, "16M"), "cpo": (2870, "17M"),
        "focops": (2270, "15M"), "cvpo": (2030, "6M"),
        "sacl": (3050, "5M"), "ddpgl": (2500, "10M"),
    },
    "SafetyHumanoidVelocity-v1": {
        # reference prescribes Mujoco20MCfg but publishes no Humanoid curve
    },
}


@dataclass
class VelFidCfg:
    results: str = ("benchmarks/results_velocity_full,"
                    "benchmarks/results_velocity_5m,"
                    "benchmarks/results_velocity")
    out: str = "docs/velocity_fidelity.md"


@cli(VelFidCfg)
def main(cfg: VelFidCfg):
    ours: dict = defaultdict(lambda: defaultdict(list))
    for d in cfg.results.split(","):
        for f in glob.glob(os.path.join(d, "*.json")):
            try:
                r = json.load(open(f))
            except Exception:
                continue
            if not isinstance(r, dict) or "algo" not in r:
                continue
            algo = r["algo"].split("-")[0]
            rew = r.get("best_reward", r["final_reward"])
            cost = r.get("best_cost", r["final_cost"])
            ours[r["task"]][algo].append(
                (rew, cost, r["budget"], "best_reward" in r))

    lines = [
        "# Velocity-suite fidelity: real MuJoCo, ours vs reference",
        "",
        "These tasks run REAL MuJoCo dynamics through the host-env path, so",
        "rewards are directly comparable to the reference's published",
        "Safety-Gymnasium velocity curves (`benchmark.rst:47-78`; plateau",
        "values read off the published reward PNGs, 3-seed means, limit 25).",
        "Ours quotes the feasibility-first best test checkpoint (deploy",
        "rule) averaged over available seeds at the largest run budget.",
        "",
        "| task | algo | reference plateau @ steps | ours (best ckpt) "
        "| ours budget | ratio |",
        "|---|---|---|---|---|---|",
    ]
    for task, ref in REFERENCE.items():
        got = ours.get(task, {})
        for algo in ("ppol", "trpol", "cpo", "focops", "cvpo", "sacl",
                     "ddpgl"):
            if algo not in got:
                continue
            vals = got[algo]
            top = max(v[2] for v in vals)
            vals = [v for v in vals if v[2] == top]
            if any(v[3] for v in vals):
                vals = [v for v in vals if v[3]]
            mean_r = sum(v[0] for v in vals) / len(vals)
            mean_c = sum(v[1] for v in vals) / len(vals)
            flags = []
            if mean_c > 1.2 * 25.0:
                flags.append("INFEASIBLE")
            if algo in ref:
                rv, rb = ref[algo]
                ref_s = f"~{rv} @ {rb}"
                ratio = f"{mean_r / rv:.2f}x"
                # flag real gaps at matched budget (reference plateau at 5M
                # and ours ran >= that budget)
                if rb == "5M" and top >= 5_000_000 and mean_r / rv < 0.8:
                    flags.append("GAP")
            else:
                ref_s, ratio = "(none published)", "—"
            flag_s = " **" + "+".join(flags) + "**" if flags else ""
            lines.append(
                f"| {task} | {algo} | {ref_s} | "
                f"{mean_r:.0f} (cost {mean_c:.0f}, n={len(vals)}) | "
                f"{top/1e6:.1f}M | {ratio}{flag_s} |")
    lines += [
        "",
        "**Swimmer ppol GAP status (r5)**: probed at 5M — softer PID",
        "(0.02/0.0002/0.05, letting the policy ride closer to the limit)",
        "scores WORSE (35.6 vs the faithful config's 44;",
        "`results_velocity_diag/`), so the gap is not controller-gain",
        "over-damping. The faithful config reproduces 0.80x over 3 seeds;",
        "remaining hypotheses (horizon/credit structure on Swimmer's",
        "drag-dominated dynamics) are documented, unresolved.",
        "",
        "Reference curves are TRAIN reward (stochastic policy, running",
        "mean); our numbers are deterministic-eval test checkpoints, which",
        "typically read slightly higher than the train curve at the same",
        "policy quality. **GAP** marks cells at matched (>=5M) budget with",
        "ratio < 0.8x — a real miss, not a budget artifact; **INFEASIBLE**",
        "marks cells whose quoted best violates cost <= 1.2x limit.",
    ]
    os.makedirs(os.path.dirname(cfg.out), exist_ok=True)
    with open(cfg.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
