# Development targets (reference-parity: the reference drives pytest/lint/docs
# through make, reference makefile:10-62)

SHELL = /bin/bash
PYTHONPATH_EXTRA = $(CURDIR)

.PHONY: test test-fast lint format bench curves native clean

# full suite on the 8-device virtual CPU mesh (conftest forces platform)
test:
	PYTHONPATH=$(PYTHONPATH_EXTRA) python -m pytest tests/ -q

# skip the slow agent-learning gates
test-fast:
	PYTHONPATH=$(PYTHONPATH_EXTRA) python -m pytest tests/ -q \
		--ignore=tests/test_all_agents.py

lint:
	python -m flake8 fsrl_tpu/ --max-line-length=100 --extend-ignore=E203,W503 \
		|| true

bench:
	python bench.py

# rebuild the C++ grid-filter kernel (a prebuilt .so ships in-tree;
# the Python fallback is used automatically when neither loads)
native:
	$(MAKE) -C fsrl_tpu/native

curves:
	PYTHONPATH=$(PYTHONPATH_EXTRA) python benchmarks/run_curves.py

clean:
	find . -name __pycache__ -type d -prune -exec rm -rf {} \;
	rm -rf .pytest_cache
