"""Docs-build gate: the static-site builder (tools/build_docs.py — the
reference ships sphinx + autodoc + doc-style gates, reference
makefile:36-62) must build cleanly, and every public module/class/function
must carry a docstring."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_docs_build_and_docstring_coverage(tmp_path):
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "build_docs.py")],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, f"docs build failed:\n{r.stdout}\n{r.stderr}"
    index = os.path.join(REPO, "docs", "_build", "html", "index.html")
    assert os.path.exists(index)
    api = os.path.join(REPO, "docs", "_build", "html",
                       "api_fsrl_tpu_algos_ppo_lag.html")
    assert os.path.exists(api), "autodoc pages missing"
