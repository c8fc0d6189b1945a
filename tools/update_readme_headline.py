"""Rewrite the README's headline throughput numbers from the newest bench
record (committed ``BENCH_r*.json``, or a JSON line passed on stdin from a
fresh ``python bench.py`` run).

Usage:
    python tools/update_readme_headline.py            # from BENCH_r*.json
    python bench.py | python tools/update_readme_headline.py --stdin
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_bench() -> dict:
    if "--stdin" in sys.argv:
        for line in sys.stdin:
            m = re.search(r'\{"metric".*\}', line)
            if m:
                return json.loads(m.group(0))
        raise SystemExit("no bench JSON line on stdin")
    benches = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    if not benches:
        raise SystemExit("no BENCH_r*.json found")
    d = json.load(open(benches[-1]))
    m = re.search(r'\{"metric".*\}', d.get("tail", ""))
    if not m:
        raise SystemExit(f"{benches[-1]} holds no parsable JSON line")
    print(f"using {os.path.basename(benches[-1])}")
    return json.loads(m.group(0))


def main() -> None:
    bench = latest_bench()
    path = os.path.join(REPO, "README.md")
    readme = open(path).read()
    v = bench["value"] / 1e6
    readme, n = re.subn(r"\*\*~[\d.]+M env-steps/s\*\*",
                        f"**~{v:.1f}M env-steps/s**", readme, count=1)
    assert n == 1, "headline pattern not found in README"
    readme = re.sub(r"\(`BENCH_r\d+\.json`\)",
                    "(latest `BENCH_r*.json`)", readme, count=1)
    off = bench.get("offpolicy", {})
    if off:
        sub = {"sacl": "SAC-Lag", "ddpgl": "DDPG-Lag", "cvpo": "CVPO"}
        for key, label in sub.items():
            if key in off:
                ks = off[key]["env_steps_per_s"] / 1e3
                readme = re.sub(label + r" [\d.]+k",
                                f"{label} {ks:.1f}k", readme, count=1)
    open(path, "w").write(readme)
    print(f"README headline -> ~{v:.1f}M env-steps/s")


if __name__ == "__main__":
    main()
