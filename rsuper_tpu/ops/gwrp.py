"""Global Weighted Rank Pooling (GWRP), TPU-native.

Reference: ``rsuper_train/training/losses_foundation.py:442-537``
``GlobalWeightedRankPooling``. Voxels are ranked in descending order; weights
decay exponentially with rank, ``w_i ∝ d^i`` with ``d = (1-c)^(1/N)`` so the
top N ranks hold fraction c of the total mass. The ball loss uses the
``return_weights=True, hard_cutoff=True`` mode: weights are zeroed past rank
N, renormalised to sum 1, and un-sorted back to voxel order
(``losses_foundation.py:516-532``; call site ``:1780``).

TPU-first redesign
------------------
A full descending sort of a 128³ volume per step is sort-bound on TPU. Since
the weight depends only on the *rank* and decays smoothly, ranks are computed
by threshold counting: `levels` fixed thresholds spanning the positive value
range give a cumulative count table; each voxel's rank is the count of voxels
in strictly-higher bins (a one-hot × table contraction that rides the MXU).
Exact sort-based versions are provided for testing and for small inputs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _decay(n, c):
    n = jnp.maximum(jnp.asarray(n, jnp.float32), 1.0)
    return (1.0 - c) ** (1.0 / n)


def gwrp_pool(x, n, c: float = 0.75):
    """Exact (sort-based) GWRP pooling of a flat or spatial array to a scalar.

    Matches the reference's default mode (``losses_foundation.py:469-537``):
    sort descending, weight w_i = d^i normalised to sum 1, return Σ x_i w_i.
    """
    flat = x.reshape(-1).astype(jnp.float32)
    sorted_desc = -jnp.sort(-flat)
    d = _decay(n, c)
    idx = jnp.arange(flat.shape[0], dtype=jnp.float32)
    w = d**idx
    w = w / jnp.sum(w)
    return jnp.sum(sorted_desc * w)


def gwrp_weights_exact(x, n, c: float = 0.75):
    """Exact (sort-based) hard-cutoff GWRP weights in voxel order.

    Matches ``return_weights=True, hard_cutoff=True``: ranks from a full
    descending argsort, w ∝ d^rank for rank < n else 0, normalised to sum 1.
    """
    shape = x.shape
    flat = x.reshape(-1).astype(jnp.float32)
    L = flat.shape[0]
    order = jnp.argsort(-flat)  # descending
    ranks = jnp.zeros(L, jnp.float32).at[order].set(jnp.arange(L, dtype=jnp.float32))
    d = _decay(n, c)
    w = jnp.where(ranks < n, d**ranks, 0.0)
    w = w / jnp.maximum(jnp.sum(w), 1e-30)
    return w.reshape(shape)


@partial(jax.jit, static_argnames=("levels",))
def gwrp_weights_binned(x, n, c: float = 0.75, *, levels: int = 256):
    """Approximate hard-cutoff GWRP weights via threshold-count ranking.

    Ranks are resolved to `levels` value bins over (0, max(x)]; all voxels in
    a bin share the rank "number of voxels in strictly higher bins". Voxels
    with value <= 0 get rank L (never selected when n <= count(x > 0)).
    """
    shape = x.shape
    flat = x.reshape(-1).astype(jnp.float32)
    L = flat.shape[0]
    hi = jnp.maximum(jnp.max(flat), 1e-30)
    # bin 0 = lowest positive values, bin levels-1 = highest; <= 0 -> -1.
    b = jnp.clip(jnp.ceil(flat / hi * levels).astype(jnp.int32), 0, levels) - 1
    # Histogram and table lookup as broadcast-compare reductions: XLA lowers
    # scatter-add / gather on TPU to scalar loops (7-8 ms EACH at 96³ on v5e,
    # from the round-2 profile) while compare-vs-iota reduces fuse into
    # vectorised passes. A radix split b = C·c + f cuts the VPU work from
    # O(V·levels) to O(V·(C+F)) — the cross table rides the MXU — with
    # BIT-IDENTICAL ranks: [b_u > b_v] = [c_u > c_v] + [c_u = c_v][f_u > f_v].
    if levels >= 16 and (levels & (levels - 1)) == 0:  # power of two: radix
        C = 1 << (levels.bit_length() // 2)
        F = levels // C
        cb = b // F  # coarse digit; -1 for non-positive voxels
        fb = b - cb * F  # fine digit in [0, F)
        oc = (cb[:, None] == jnp.arange(C, dtype=jnp.int32)).astype(jnp.float32)
        of = (fb[:, None] == jnp.arange(F, dtype=jnp.int32)).astype(jnp.float32)
        # (C, F) bin-count table: one tall-skinny matmul over V (MXU work).
        T = jnp.einsum("vc,vf->cf", oc, of)
        counts_c = jnp.sum(T, axis=1)  # (C,)
        higher_c = jnp.cumsum(counts_c[::-1])[::-1] - counts_c
        # S[c, f] = count of voxels with coarse == c and fine > f.
        S = jnp.cumsum(T[:, ::-1], axis=1)[:, ::-1] - T
        # the oc @ S row lookup MUST run at HIGHEST matmul precision: S holds
        # integer counts up to V (~2M) and the TPU's default bf16-operand
        # matmul would round them (ulp 2048 at 880k), flipping the hard
        # `ranks < n` cutoff near the boundary. HIGHEST keeps the integer
        # products exact in f32; the round pins any residual accumulation dust
        s_rows = jnp.matmul(oc, S, precision=jax.lax.Precision.HIGHEST)
        ranks = jnp.round(
            jnp.sum(oc * higher_c[None, :], axis=-1)
            + jnp.sum(of * s_rows, axis=-1)
        )
    else:
        lv = jnp.arange(levels, dtype=jnp.int32)
        onehot = (b[:, None] == lv[None, :]).astype(jnp.float32)  # fused
        counts = jnp.sum(onehot, axis=0)  # (levels,)
        # rank of a voxel in bin k = count of voxels in bins > k.
        higher = jnp.cumsum(counts[::-1])[::-1] - counts
        ranks = jnp.sum(onehot * higher[None, :], axis=-1)  # lookup, fused
    ranks = jnp.where(b < 0, jnp.float32(L), ranks)
    d = _decay(n, c)
    w = jnp.where(ranks < n, d**ranks, 0.0)
    w = w / jnp.maximum(jnp.sum(w), 1e-30)
    return w.reshape(shape)


def gwrp_weights(x, n, c: float = 0.75, *, method: str = "auto", levels: int = 256):
    """Hard-cutoff GWRP weights in voxel order (sum 1 over the top-n ranks).

    method='exact' sorts (small inputs / tests); 'binned' uses threshold-count
    ranking; 'auto' picks exact for <= 64³ voxels.
    """
    if method == "auto":
        method = "exact" if x.size <= 64**3 else "binned"
    if method == "exact":
        return gwrp_weights_exact(x, n, c)
    return gwrp_weights_binned(x, n, c, levels=levels)
