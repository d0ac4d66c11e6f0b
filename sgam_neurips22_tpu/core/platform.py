"""Platform selection that survives eagerly-registered PJRT plugins.

The documented way to pin the backend is the ``JAX_PLATFORMS`` env var —
but a site-installed PJRT plugin (e.g. a remote-TPU tunnel registered from
``sitecustomize``) can claim the default backend regardless of the env var.
``jax.config.update("jax_platforms", ...)`` always wins, so every CLI calls
:func:`apply_platform_env` before its first jax use: whatever the user put
in ``JAX_PLATFORMS`` becomes the actual platform list.
"""
from __future__ import annotations

import os


def apply_platform_env() -> None:
    platforms = os.environ.get("JAX_PLATFORMS")
    if not platforms:
        return
    try:
        import jax

        jax.config.update("jax_platforms", platforms)
    except Exception:
        # never block a CLI on platform pinning; jax surfaces its own
        # error at first use if the requested backend is unavailable
        pass
