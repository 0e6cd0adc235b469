"""Top-N voxel selection with static shapes.

The reference's ``isolate_tumor`` selects the N highest-valued voxels of a
masked volume with ``torch.topk`` where N is the (data-dependent) reported
tumor volume (``rsuper_train/training/losses_foundation.py:1473-1501``).
A data-dependent k is incompatible with XLA's static-shape model, and a full
top-k over 128³ = 2M voxels is sort-bound.

TPU-first redesign: find the value threshold t such that
``count(x >= t) ~= n`` by bisection — `iters` fixed-shape pass(es) of a
masked sum reduction (pure VPU work, no sort, no gather) — then return the
mask ``(x >= t) & (x > 0)``. Strictly-zero voxels are never selected, mirroring
the reference's behaviour of topk over a volume whose outside-ball voxels are
exactly 0 followed by the dilation fall-back when too few positive voxels
exist.

With continuous network outputs ties are measure-zero, so the selected count
is within bisection resolution of n.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("iters",))
def topn_threshold(x, n, *, iters: int = 26, hi=None):
    """Largest threshold t in (0, hi] with ``count(x >= t) >= n`` (bisection).

    `n` may be traced. Returns a scalar threshold; never returns exactly 0
    (zeros are excluded from selection).
    """
    x = x.astype(jnp.float32)
    if hi is None:
        hi = jnp.max(x)
    lo = jnp.zeros_like(hi)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum(x >= mid)
        ok = cnt >= n
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo


def _use_pallas() -> bool:
    from .dispatch import pallas_enabled

    return pallas_enabled()


# VMEM budget: volumes up to ~3.5M f32 elements fit on-chip (~14 MB + slack)
_PALLAS_MAX_ELEMS = 3_500_000


@partial(jax.jit, static_argnames=("iters", "use_pallas"))
def _topn_mask_impl(x, n, *, iters: int, use_pallas: bool):
    # threshold selection is piecewise-constant — never differentiable; the
    # Pallas kernel also has no VJP, so cut the tape explicitly
    x_ng = jax.lax.stop_gradient(x)
    if use_pallas:
        from .pallas_topn import pallas_topn_threshold

        t = pallas_topn_threshold(x_ng, n, iters=iters)
    else:
        t = topn_threshold(x_ng, n, iters=iters)
    return ((x_ng >= t) & (x_ng > 0)).astype(jnp.float32)


def topn_mask(x, n, *, iters: int = 26):
    """Binary mask over the ~n largest strictly-positive entries of `x`.

    Static-shape replacement for ``torch.topk`` + scatter
    (``losses_foundation.py:1483-1499``). `n` may be traced. If fewer than n
    entries are positive the mask holds every positive entry (callers handle
    the shortfall, as the reference does with its dilation loop).

    On TPU, volumes that fit in VMEM use the fused Pallas bisection kernel
    (one HBM read instead of `iters` sweeps; see ``pallas_topn``). The
    Pallas/XLA choice is resolved HERE — at the caller's trace time, where
    `ops.dispatch` scopes apply — and passed down as a static jit key, so a
    cached inner trace can never leak across `pallas_disabled()` scopes.
    """
    return _topn_mask_impl(
        x, n, iters=iters,
        use_pallas=_use_pallas() and x.size <= _PALLAS_MAX_ELEMS,
    )


@partial(jax.jit, static_argnames=("iters", "use_pallas"))
def _topn_masks_multi_impl(x, ns, *, iters: int, use_pallas: bool):
    x_ng = jax.lax.stop_gradient(x)
    ns = jnp.asarray(ns, jnp.float32).reshape(-1)
    if use_pallas:
        from .pallas_topn import pallas_topn_threshold_multi

        ts = pallas_topn_threshold_multi(x_ng, ns, iters=iters)
    else:
        ts = jax.vmap(lambda n: topn_threshold(x_ng, n, iters=iters))(ns)
    shape = (ns.shape[0],) + (1,) * x.ndim
    ts = ts.reshape(shape)
    return ((x_ng[None] >= ts) & (x_ng[None] > 0)).astype(jnp.float32)


def topn_masks_multi(x, ns, *, iters: int = 26):
    """Stack of binary masks (K, *x.shape), one per n in `ns` (K,).

    On TPU all K bisections share ONE fused Pallas kernel (single VMEM load);
    elsewhere a vmapped bisection. Used by the ball loss for its
    (N, N_small, N_big) mask triple. Pallas/XLA resolved at the caller's
    trace time (see `topn_mask`)."""
    return _topn_masks_multi_impl(
        x, ns, iters=iters,
        use_pallas=_use_pallas() and x.size <= _PALLAS_MAX_ELEMS,
    )


@partial(jax.jit, static_argnames=("iters", "use_pallas"))
def _topn_masks_multi_batched_impl(x, ns, *, iters: int, use_pallas: bool):
    x_ng = jax.lax.stop_gradient(x)
    B = x.shape[0]
    ns = jnp.asarray(ns, jnp.float32).reshape(B, -1)
    if use_pallas:
        from .pallas_topn import pallas_topn_threshold_multi_batched

        ts = pallas_topn_threshold_multi_batched(x_ng, ns, iters=iters)
    else:
        ts = jax.vmap(
            lambda xi, ni: jax.vmap(
                lambda n: topn_threshold(xi, n, iters=iters)
            )(ni)
        )(x_ng, ns)
    ts = ts.reshape(ts.shape + (1,) * (x.ndim - 1))  # (B, K, 1...)
    xb = x_ng[:, None]  # (B, 1, *spatial)
    return ((xb >= ts) & (xb > 0)).astype(jnp.float32)


def topn_masks_multi_batched(x, ns, *, iters: int = 26):
    """Batched `topn_masks_multi`: x (B, *spatial), ns (B, K) ->
    masks (B, K, *spatial).

    On TPU this runs the grid-over-batch Pallas kernel (one VMEM load per
    item, all K bisections on-chip); elsewhere a double-vmapped bisection.
    The per-item volume (not the whole batch) must fit in VMEM. Pallas/XLA
    resolved at the caller's trace time (see `topn_mask`).
    """
    per_item = x.size // x.shape[0]
    return _topn_masks_multi_batched_impl(
        x, ns, iters=iters,
        use_pallas=_use_pallas() and per_item <= _PALLAS_MAX_ELEMS,
    )
