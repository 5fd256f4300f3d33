"""Test env setup: force an 8-device virtual CPU platform BEFORE jax import.

Multi-chip sharding is exercised on a virtual host-platform mesh
(xla_force_host_platform_device_count), so "multi-chip" is testable without
TPU hardware; benches run separately on the real chip.
"""

import os

# Force CPU regardless of the ambient platform (the image exports
# JAX_PLATFORMS=axon for the TPU tunnel; tests must be hermetic and leave
# the TPU free for benchmarks/training).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: the sim step is a large graph (~2k ops) and
# CPU compiles run ~1 min — cache them across test files and reruns.
import jax  # noqa: E402

# The image's axon site hook re-asserts JAX_PLATFORMS=axon; the config knob
# wins over the env var, so force CPU here too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
