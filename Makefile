# Developer entry points (reference parity: /root/reference/Makefile runs
# cargo nextest / clippy / fmt; here: pytest / ruff).

.PHONY: test test-fast lint format bench native clean

test: native
	python -m pytest tests/ -q

test-fast: native
	python -m pytest tests/ -q -x -m "not slow"

lint:
	python -m ruff check stark_anatomy_tpu tests bench.py __graft_entry__.py || true

format:
	python -m ruff format stark_anatomy_tpu tests bench.py __graft_entry__.py || true

bench:
	python bench.py

native: native/libfield128.so

native/libfield128.so: native/field128.cpp
	g++ -O2 -shared -fPIC -o $@ $<

clean:
	rm -rf .jax_cache_cpu .jax_cache_tpu native/libfield128.so .pytest_cache
