PYTHON ?= python3

test:
	$(PYTHON) -m pytest tests/ -q

test_matrix:
	$(MAKE) -C tests all

bench:
	$(PYTHON) bench.py

benchmarks:
	$(PYTHON) benchmarks/run_benchmarks.py

.PHONY: test test_matrix bench benchmarks
