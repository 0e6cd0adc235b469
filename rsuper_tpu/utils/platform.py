"""Backend selection for the CLIs.

The deployment image pins a remote-TPU PJRT platform via sitecustomize and
jax.config, so the plain ``JAX_PLATFORMS`` env var is ignored once jax is
imported. ``RSUPER_PLATFORM=cpu python train.py ...`` gives smoke runs and
CI a working escape hatch: call :func:`apply_platform_env` before the first
jax operation (each CLI main does).
"""

from __future__ import annotations

import os


def apply_platform_env(var: str = "RSUPER_PLATFORM") -> str | None:
    """Pin ``jax_platforms`` from the env var, if set. Returns the platform."""
    plat = os.environ.get(var)
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    return plat
