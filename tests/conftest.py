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
