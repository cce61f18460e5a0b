"""Test environment: force the JAX CPU backend with 8 virtual devices.

Tests are bit-exact integer math, so CPU vs TPU makes no numerical
difference; 8 virtual devices let the mesh/sharding tests (tests/test_mesh.py)
exercise real multi-device lowering without TPU hardware (SURVEY.md section 4).
Must run before the first `import jax` anywhere in the test session.
"""

import os

# Force, don't setdefault: the environment ships JAX_PLATFORMS=axon (the
# real-TPU tunnel), and running the bit-exact unit suite over the tunnel
# is both slow (every compile crosses the wire) and unnecessary.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: the suite's cost is dominated by jit
# compiles of tiny fixed-shape kernels; caching them across pytest runs
# turns minutes of XLA time into milliseconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
