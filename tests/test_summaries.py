"""Benchmark-artifact freshness gate: every result JSON in a results
directory must appear as a row in that directory's summary-{task}.md.

Round-2 review found committed summaries that disagreed with their own
JSONs (a one-cell run_curves invocation used to clobber the whole summary);
run_curves.py now regenerates summaries from ALL JSONs, and this test fails
the suite if a stale summary is ever committed again."""

import glob
import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULT_DIRS = sorted(
    d for d in glob.glob(os.path.join(REPO, "benchmarks", "results*"))
    if os.path.isdir(d) and "results_archive" not in d)
# results_archive/** holds frozen records of superseded env versions /
# diagnosis probes; summaries are only maintained for live result dirs.


def iter_results(d):
    for f in sorted(glob.glob(os.path.join(d, "*.json"))):
        try:
            r = json.load(open(f))
        except Exception:
            continue
        if isinstance(r, dict) and "algo" in r and "task" in r:
            yield os.path.basename(f), r


@pytest.mark.parametrize("d", RESULT_DIRS, ids=[os.path.basename(d)
                                                for d in RESULT_DIRS])
def test_summaries_cover_all_jsons(d):
    missing = []
    for fname, r in iter_results(d):
        summary = os.path.join(d, f"summary-{r['task']}.md")
        if not os.path.exists(summary):
            missing.append(f"{fname}: no {os.path.basename(summary)}")
            continue
        rows = [ln for ln in open(summary) if ln.startswith("|")]
        seed = r.get("seed", 0)
        # row format: "| <algo>[ (tag)] | <seed> | <budget> | ..."
        pat = re.compile(
            r"^\|\s*" + re.escape(r["algo"]) + r"(\s*\([^)]*\))?\s*\|\s*"
            + str(seed) + r"\s*\|")
        if not any(pat.match(ln) for ln in rows):
            missing.append(f"{fname}: no row {r['algo']}/s{seed} in "
                           f"{os.path.basename(summary)}")
    assert not missing, (
        f"{d} has JSONs absent from summaries (run "
        f"`python benchmarks/make_summaries.py`):\n" + "\n".join(missing))
