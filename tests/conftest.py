"""Test configuration.

Forces JAX onto the host CPU platform with 8 virtual devices so sharding /
multi-chip code paths can be exercised without TPU hardware. Must run before
any test module imports jax.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# persistent compilation cache: bucket-shaped kernels compile once per machine
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
