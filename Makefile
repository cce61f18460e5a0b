# Developer entry points (reference parity: /root/reference/Makefile runs
# cargo nextest / clippy / fmt; here: pytest / ruff).

.PHONY: test test-fast test-tpu lint format bench native clean

test: native
	python -m pytest tests/ -q

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
