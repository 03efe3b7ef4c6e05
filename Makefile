PYTHON ?= python3

test:
	$(PYTHON) -m pytest tests/ -q

test_matrix:
	$(MAKE) -C tests all

bench:
	$(PYTHON) bench.py

benchmarks:
	$(PYTHON) benchmarks/run_benchmarks.py

# Lint gate: ruff when available (CI installs it), otherwise a syntax
# compile over every tracked source so the target still catches breakage
# in environments without lint tooling.
lint:
	@if $(PYTHON) -m ruff --version >/dev/null 2>&1; then \
		$(PYTHON) -m ruff check .; \
	else \
		echo "ruff not installed; falling back to compileall syntax gate"; \
		$(PYTHON) -m compileall -q odil_tpu odil examples tests tests_tpu benchmarks tools bench.py __graft_entry__.py; \
	fi

.PHONY: test test_matrix bench benchmarks lint
