"""Test harness: force a virtual 8-device CPU mesh.

The container's sitecustomize imports jax and registers the remote 'axon'
TPU backend at interpreter startup, so env vars alone are too late —
``jax.config.update`` after import is the reliable switch.  Backends
initialize lazily, so setting XLA_FLAGS here (before the first
``jax.devices()``) still takes effect for the host-platform device count.

Multi-chip sharding is validated on this virtual mesh per the build
contract; the real-TPU path is exercised by bench.py / __graft_entry__.py.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache (VERDICT r4 #6): the suite's wall time is
# dominated by XLA compiles of the same chain programs run over run (the
# box exposes ONE host CPU, so pytest-xdist cannot help — parallel workers
# just contend).  Measured on the 381-test suite: 21:48 cold, 9:22 warm.
# Point AEFS_TEST_CACHE_DIR elsewhere (or at an empty dir) for a
# guaranteed-cold release-gate run.
_cache_dir = os.environ.get("AEFS_TEST_CACHE_DIR", "/tmp/aefs_test_cache")
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
