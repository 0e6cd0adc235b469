"""Central Pallas dispatch switch.

Every Pallas kernel in ``ops/`` (channel-first conv, depthwise conv, top-N
bisection) is an XLA *custom call* — GSPMD cannot partition one. Under
spatial (context-parallel) sharding, activations arrive depth-sharded over
the mesh ``model`` axis and the custom call would force a full all-gather or
fail to lower, so the trainer scopes ``pallas_disabled()`` around the spatial
step's calls (``train/step.build_train_step`` when the mesh has a >1
``model`` axis — the first call traces under it) and XLA's partitionable
convolutions take over, halo exchanges included; everything else traced in
the process keeps the Pallas kernels.

The flag is consulted at TRACE time: set it before the first call of any
jitted function whose trace should honour it (jit caches do not key on it).
``RSUPER_DISABLE_PALLAS=1`` in the environment forces it off.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

import jax

_PALLAS_ENABLED = True
_PALLAS_FORCED = False

# dwconv's kernel-signature trace hook lives here to avoid an import cycle
# (trace_shapes sets it; dwconv reads it via getattr).
_dw_trace_hook = None


def set_pallas_enabled(enabled: bool) -> None:
    global _PALLAS_ENABLED
    _PALLAS_ENABLED = bool(enabled)


def pallas_enabled() -> bool:
    """True when Pallas kernels may be dispatched on this backend."""
    if os.environ.get("RSUPER_DISABLE_PALLAS"):
        return False
    if not _PALLAS_ENABLED:
        return False
    if _PALLAS_FORCED:
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # backend not initialised yet
        return False


@contextmanager
def pallas_forced():
    """Force the TPU dispatch decisions during ABSTRACT tracing on any
    backend — `ops/trace_shapes.py` uses this under `jax.eval_shape` to
    collect the exact kernel-signature inventory a real-TPU graph would
    lower, from a CPU host. Never wrap real computation on a non-TPU
    backend in this (Mosaic kernels do not lower there)."""
    global _PALLAS_FORCED
    prev = _PALLAS_FORCED
    _PALLAS_FORCED = True
    try:
        yield
    finally:
        _PALLAS_FORCED = prev


@contextmanager
def pallas_disabled():
    global _PALLAS_ENABLED
    prev = _PALLAS_ENABLED
    _PALLAS_ENABLED = False
    try:
        yield
    finally:
        _PALLAS_ENABLED = prev
