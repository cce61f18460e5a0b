# Developer entry points (reference parity: /root/reference/Makefile runs
# cargo nextest / clippy / fmt; here: pytest / ruff).

.PHONY: test test-fast test-tpu lint format bench native clean

# -n auto --dist loadfile: module-parallel workers (pytest-xdist). The
# suite is dominated by XLA compiles + CPU-backend proves spread across
# ~15 modules; loadfile keeps module-scoped fixtures (and the per-module
# jax cache clearing in conftest.py) coherent per worker. ~2x wall time.
test: native
	python -m pytest tests/ -q -n auto --dist loadfile

test-fast: native
	python -m pytest tests/ -q -x -m "not slow"

# Real-hardware kernel smoke: run in the bench environment each round.
test-tpu:
	STARK_ANATOMY_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -q

lint:
	python -m ruff check stark_anatomy_tpu tests bench.py __graft_entry__.py examples tools

format:
	python -m ruff format stark_anatomy_tpu tests bench.py __graft_entry__.py examples tools

bench:
	python bench.py

native: native/libfield128.so

native/libfield128.so: native/field128.cpp
	g++ -O2 -shared -fPIC -o $@ $<

clean:
	rm -rf .jax_cache_cpu .jax_cache_tpu native/libfield128.so .pytest_cache
