# Development targets (reference-parity: the reference drives pytest/lint/docs
# through make, reference makefile:10-62)

SHELL = /bin/bash
PYTHONPATH_EXTRA = $(CURDIR)

.PHONY: test test-fast lint format bench curves summaries native docs \
	docs-check clean

# full suite on the 8-device virtual CPU mesh (conftest forces platform)
test:
	PYTHONPATH=$(PYTHONPATH_EXTRA) python -m pytest tests/ -q

# skip the slow agent-learning gates
test-fast:
	PYTHONPATH=$(PYTHONPATH_EXTRA) python -m pytest tests/ -q \
		--ignore=tests/test_all_agents.py

# enforcing (exits nonzero on findings), like the reference's flake8 gate
# (reference makefile:20-34); the image ships no flake8, so tools/lint.py
# implements the high-value subset on stdlib ast
lint:
	python tools/lint.py fsrl_tpu tests benchmarks tools

format: lint

bench:
	python bench.py

# rebuild the C++ grid-filter kernel (a prebuilt .so ships in-tree;
# the Python fallback is used automatically when neither loads)
native:
	$(MAKE) -C fsrl_tpu/native

curves:
	PYTHONPATH=$(PYTHONPATH_EXTRA) python benchmarks/run_curves.py

# regenerate every summary-{task}.md + PNG from the result JSONs (the single
# source of truth); tests/test_summaries.py gates that these stay in sync
summaries:
	PYTHONPATH=$(PYTHONPATH_EXTRA) python benchmarks/make_summaries.py

# build the static docs site (API autodoc + tutorials) into
# docs/_build/html; fails on missing public docstrings — the analog of the
# reference's sphinx + pydocstyle/doc8 gates (reference makefile:36-62)
docs:
	PYTHONPATH=$(PYTHONPATH_EXTRA) python tools/build_docs.py

# docstring-coverage gate only (no HTML output) — used by CI
docs-check:
	PYTHONPATH=$(PYTHONPATH_EXTRA) python tools/build_docs.py --check

clean:
	find . -name __pycache__ -type d -prune -exec rm -rf {} \;
	rm -rf .pytest_cache
