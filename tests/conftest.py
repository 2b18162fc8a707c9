import os

# Tests run on CPU with 8 virtual devices (multi-chip sharding is validated on a
# virtual mesh; the real TPU is reserved for benchmarks) and float64 enabled so
# reference/golden comparisons match deal.II's double-precision behavior.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_enable_x64", True)
# persistent compilation cache: compiles dominate wall time on this box
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
