"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
tests exercise real collectives without TPU hardware (the driver separately
dry-runs the multi-chip path)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compile cache: the suite is compile-bound on CPU; cache across
# runs so iteration stays fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
