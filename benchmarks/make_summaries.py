"""Regenerate per-task summary markdowns (and curve PNGs) from the result
JSONs in a results directory — the single source of truth. Older summaries
written mid-round (before the best-checkpoint columns existed, or before a
collapse fix re-run) are replaced wholesale.

For runs recorded before ``best_*`` fields existed, the feasibility-first
best (the reference's model-selection rule, ``base_trainer.py:247-262``) is
reconstructed from the stored per-epoch curve.

Usage:
    python benchmarks/make_summaries.py --dirs benchmarks/results,benchmarks/results_1m
"""

from __future__ import annotations

import glob
import json
import os
from collections import defaultdict
from dataclasses import dataclass

from fsrl_tpu.config.cli import cli


def best_from_curve(curve: dict, limit: float) -> tuple[float, float]:
    best_r, best_c, has = -float("inf"), float("inf"), False
    for r, c in zip(curve["reward"], curve["cost"]):
        new_feas, old_feas = c <= limit, best_c <= limit
        better = (new_feas and not old_feas) or (
            new_feas == old_feas and r > best_r)
        if better or not has:
            best_r, best_c, has = r, c, True
    return best_r, best_c


@dataclass
class SumCfg:
    dirs: str = ("benchmarks/results_1m,benchmarks/results_5m,"
                 "benchmarks/results_velocity,"
                 "benchmarks/results_velocity_5m")
    plot: bool = True


def load_dir(d: str) -> dict[str, list]:
    """All result JSONs in ``d``, grouped by task."""
    by_task = defaultdict(list)
    for f in sorted(glob.glob(os.path.join(d, "*.json"))):
        try:
            r = json.load(open(f))
        except Exception:
            continue
        if isinstance(r, dict) and "algo" in r and "task" in r:
            r["_file"] = os.path.basename(f)
            by_task[r["task"]].append(r)
    return by_task


def summarize_dir(d: str, plot_curves: bool = True) -> None:
    """Regenerate every summary-{task}.md (and PNG) in a results dir from
    ALL its JSONs. run_curves.py calls this after each invocation, so
    one-cell-at-a-time grid scripts can never leave a stale summary."""
    for task, rows in load_dir(d).items():
        rows.sort(key=lambda r: (r["algo"], r.get("seed", 0), r["_file"]))
        limit = rows[0].get("cost_limit", 25.0)
        md = [f"# Curves: {task} (cost_limit={limit})", "",
              "Best = feasibility-first best test checkpoint (the "
              "reference's model-selection rule); final = evaluation of "
              "the last state. Oscillating Lagrangian methods can end a "
              "run mid-violation — deploy the best checkpoint.", "",
              "| algo | seed | budget | final reward | final cost | "
              "best reward | best cost | steps/s |",
              "|---|---|---|---|---|---|---|---|"]
        for r in rows:
            if "best_reward" not in r and "curve" in r:
                br, bc = best_from_curve(r["curve"], limit)
                r["best_reward"], r["best_cost"] = br, bc
            tag = ""
            if "-pid" in r["_file"]:
                tag = " (pid-retune)"
            md.append(
                f"| {r['algo']}{tag} | {r.get('seed', 0)} | "
                f"{r['budget']:,} | {r['final_reward']:.1f} | "
                f"{r['final_cost']:.1f} | {r['best_reward']:.1f} | "
                f"{r['best_cost']:.1f} | {r['steps_per_s']:,.0f} |")
        out = os.path.join(d, f"summary-{task}.md")
        with open(out, "w") as f:
            f.write("\n".join(md) + "\n")
        print("wrote", out)
        if plot_curves:
            try:
                plot(task, rows, limit, d)
            except Exception as e:
                print("plot skipped:", e)


@cli(SumCfg)
def main(cfg: SumCfg):
    for d in cfg.dirs.split(","):
        if os.path.isdir(d):
            summarize_dir(d, plot_curves=cfg.plot)


def plot(task, rows, limit, outdir):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
    for r in rows:
        c = r.get("curve")
        if not c:
            continue
        label = f"{r['algo']}-s{r.get('seed', 0)}"
        ax1.plot(c["env_step"], c["reward"], label=label, lw=1)
        ax2.plot(c["env_step"], c["cost"], label=label, lw=1)
    ax2.axhline(limit, color="k", ls="--", lw=1, label="limit")
    ax1.set_title(f"{task} reward")
    ax2.set_title(f"{task} episodic cost")
    for ax in (ax1, ax2):
        ax.set_xlabel("env steps")
        ax.legend(fontsize=6, ncol=2)
    fig.tight_layout()
    out = os.path.join(outdir, f"curves-{task}.png")
    fig.savefig(out, dpi=120)
    plt.close(fig)
    print("wrote", out)


if __name__ == "__main__":
    main()
