"""Test environment: force the JAX CPU backend with 8 virtual devices.

Tests are bit-exact integer math, so CPU vs TPU makes no numerical
difference; 8 virtual devices let the mesh/sharding tests
(tests/test_mesh.py) exercise real multi-device lowering without TPU
hardware (SURVEY.md section 4).

Gotcha: the environment's sitecustomize (axon TPU tunnel) imports jax at
interpreter startup, so JAX_PLATFORMS in os.environ is latched before this
file runs — the platform must be forced through jax.config instead.
XLA_FLAGS is still read at first backend initialization, which happens
later, so setting it here works.
"""

import os

#: STARK_ANATOMY_TPU_TESTS=1 leaves the real backend in place so the
#: device smoke tests (tests/test_tpu_smoke.py) exercise the actual TPU —
#: interpret-mode Pallas coverage cannot catch tiling/layout bugs that
#: only real lowering hits. Everything shape-portable still passes either
#: way; run `make test-tpu` on hardware each round.
_TPU_MODE = bool(os.environ.get("STARK_ANATOMY_TPU_TESTS"))

if not _TPU_MODE:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# Persistent compilation cache: the suite's cost is dominated by jit
# compiles of tiny fixed-shape kernels; caching them across pytest runs
# turns minutes of XLA time into milliseconds.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    "/root/repo/.jax_cache_tpu" if _TPU_MODE else "/root/repo/.jax_cache_cpu",
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax  # noqa: E402  (after XLA_FLAGS; see module docstring)

if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")


import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration tests (skipped by make test-fast)"
    )


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """XLA:CPU's in-process JIT segfaults sporadically in long sessions
    with many live executables; dropping compiled caches between modules
    avoids it. The on-disk compilation cache keeps recompiles cheap."""
    yield
    jax.clear_caches()
