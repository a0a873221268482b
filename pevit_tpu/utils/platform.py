"""Platform selection fix-up.

This image's TPU plugin registers itself from ``sitecustomize`` and
overwrites the ``jax_platforms`` config at interpreter start, which silently
breaks the standard ``JAX_PLATFORMS`` environment contract (export
JAX_PLATFORMS=cpu still lands on the TPU).  ``ensure_platform()`` restores
the env var's meaning; every CLI entry point calls it first.
"""

from __future__ import annotations

import os


def ensure_platform() -> None:
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    import jax

    try:
        if jax.config.jax_platforms != env:
            jax.config.update("jax_platforms", env)
    except Exception:
        pass
