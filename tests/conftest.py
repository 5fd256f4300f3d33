"""Test env setup: force an 8-device virtual CPU platform BEFORE jax import.

Multi-chip sharding is exercised on a virtual host-platform mesh
(xla_force_host_platform_device_count), so "multi-chip" is testable without
TPU hardware; benches run separately on the real chip.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
