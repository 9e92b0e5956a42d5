"""Runtime platform selection.

The container's sitecustomize pins JAX to the remote 'axon' TPU backend at
interpreter startup, so ``JAX_PLATFORMS`` env alone cannot switch platforms
— ``jax.config.update`` after import can.  ``AEFS_PLATFORM`` picks the
backend for server/CLI entry points:

    AEFS_PLATFORM=cpu    — local CPU (development, CI)
    AEFS_PLATFORM=axon   — remote TPU (default: whatever jax resolved)

Call ``select_platform()`` before the first jax dispatch.
"""

from __future__ import annotations

import os


def select_platform(default: str | None = None) -> str:
    import jax

    choice = os.environ.get("AEFS_PLATFORM", default or "")
    if choice:
        jax.config.update("jax_platforms", choice)
    return jax.default_backend()
