import os

# Tests run on CPU with 8 virtual devices (multi-chip sharding is validated on a
# virtual mesh; the real TPU is reserved for benchmarks) and float64 enabled so
# reference/golden comparisons match deal.II's double-precision behavior.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# the axon sitecustomize pre-imports jax and pins jax_platforms="axon,cpu"
# BEFORE this file runs, so the env var alone does not stick — force it by
# config (tests must never bind the real TPU; it is reserved for bench.py)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compilation cache: compiles dominate wall time on this box
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_configure(config):
    # `slow` tags tests >~15 s on the 1-core CI box (sharded-driver parity,
    # on-mesh convergence runs).  The DEFAULT run includes them — the full
    # suite is the contract; `pytest -m "not slow"` is the quick dev loop
    # (~5 min instead of ~17).
    config.addinivalue_line(
        "markers", "slow: long-running test (excluded via -m 'not slow')")
