"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
tests exercise real collectives without TPU hardware (the driver separately
dry-runs the multi-chip path)."""

import os

# Persistent compile cache: the suite is compile-bound on CPU; cache across
# runs so iteration stays fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# The environment may pre-import jax at interpreter start (a sitecustomize
# that registers an accelerator plugin), in which case jax has already
# latched JAX_PLATFORMS from the original env and the assignments above are
# too late.  Update the live config as well — backends are not initialized
# yet at conftest time, so this still takes effect.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 8, (
    f"test harness expected an 8-device CPU mesh, got {jax.devices()}; "
    "XLA_FLAGS was read too late — check for pre-initialized backends")
