"""Freshness gates for the fidelity docs and README headline numbers.

Round-3 verdict: ``docs/velocity_fidelity.md`` predated the 5M runs and the
README still quoted round-2 bench numbers. These gates fail the suite if

1. a fidelity doc no longer matches what its generator produces from the
   committed result JSONs (the docs are generated artifacts — regenerate
   with ``python benchmarks/nav_fidelity.py`` / ``velocity_fidelity.py``);
2. the README's headline env-steps/s claim disagrees with the newest
   committed ``BENCH_r*.json``.
"""

import glob
import json
import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("script,doc", [
    ("benchmarks/nav_fidelity.py", "docs/nav_fidelity.md"),
    ("benchmarks/velocity_fidelity.py", "docs/velocity_fidelity.md"),
    ("benchmarks/env_fidelity.py", "docs/env_fidelity.md"),
])
def test_fidelity_doc_matches_regeneration(tmp_path, script, doc):
    out = tmp_path / "regen.md"
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, script), "--out", str(out)],
        capture_output=True, text=True, env=env, timeout=120)
    assert r.returncode == 0, r.stderr
    committed = open(os.path.join(REPO, doc)).read()
    assert committed == out.read_text(), (
        f"{doc} is stale — regenerate with `python {script}` "
        "(new result JSONs landed since it was last written)")


def test_readme_headline_matches_latest_bench():
    benches = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    if not benches:
        pytest.skip("no committed bench record")
    d = json.load(open(benches[-1]))
    m = re.search(r'\{"metric".*\}', d.get("tail", ""))
    if not m:
        pytest.skip("bench record holds no parsable JSON line")
    bench = json.loads(m.group(0))
    headline_m = bench["value"] / 1e6
    readme = open(os.path.join(REPO, "README.md")).read()
    got = re.search(r"\*\*~([\d.]+)M env-steps/s\*\*", readme)
    assert got, "README has no '**~N.NM env-steps/s**' headline"
    quoted = float(got.group(1))
    # tolerance-based: the driver records BENCH_r{N}.json AFTER the round's
    # last commit, so an exact-match gate is stale by construction — and a
    # round's perf work lands BETWEEN bench records, so the README may
    # legitimately lead the last committed record by the round's gain.
    # 10% covers run jitter plus one round of improvement; regenerate with
    # tools/update_readme_headline.py.
    assert abs(quoted - headline_m) <= 0.10 * headline_m, (
        f"README headline ~{quoted}M is stale vs {headline_m:.1f}M from "
        f"{os.path.basename(benches[-1])} — run "
        "tools/update_readme_headline.py")
