"""Pallas TPU kernel: bisection top-N threshold with the volume in VMEM.

`ops.selection.topn_threshold` runs ~26 bisection iterations, each a full
masked-count reduction. As plain XLA that is 26 HBM sweeps of the volume
(~26 × 3.4 MB at 96³ per selection; the ball loss performs 3 selections × 10
tumor slots × batch per step). A 96³-128³ float32 volume fits in VMEM
(~16 MB/core), so this kernel loads it once and runs the whole bisection
loop on-chip: one HBM read instead of 26.

The volume is passed flattened to (rows, 128) lanes (pad with -inf-ish
sentinel ≤ 0, which the selection semantics already ignore).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8


def _bisect_kernel(n_ref, x_ref, out_ref, *, iters: int, k: int):
    x = x_ref[:]
    hi0 = jnp.max(x)

    for j in range(k):  # static unroll over the requested Ns
        n = n_ref[j]

        def body(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            cnt = jnp.sum((x >= mid).astype(jnp.float32))
            ok = cnt >= n
            return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

        lo, _ = jax.lax.fori_loop(0, iters, body, (jnp.zeros_like(hi0), hi0))
        out_ref[0, j] = lo


@partial(jax.jit, static_argnames=("iters", "interpret"))
def pallas_topn_threshold_multi(x, ns, *, iters: int = 26, interpret: bool = False):
    """Thresholds (K,) — for each n in `ns`, the largest t with
    count(x >= t) >= n — computed in ONE kernel invocation: the volume is
    loaded into VMEM once and all K bisections run on-chip.

    `ns`: (K,) array (traced values fine, K static). The volume must fit in
    VMEM (<= ~3.5M float32 elements).
    """
    flat = x.reshape(-1).astype(jnp.float32)
    V = flat.shape[0]
    rows = -(-V // LANES)
    rows_pad = -(-rows // SUBLANES) * SUBLANES
    padded = jnp.zeros((rows_pad * LANES,), jnp.float32).at[:V].set(flat)
    padded = padded.reshape(rows_pad, LANES)
    ns = jnp.asarray(ns, jnp.float32).reshape(-1)
    k = ns.shape[0]

    out = pl.pallas_call(
        partial(_bisect_kernel, iters=iters, k=k),
        out_shape=jax.ShapeDtypeStruct((1, k), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=interpret,
    )(ns, padded)
    return out[0]


def pallas_topn_threshold(x, n, *, iters: int = 26, interpret: bool = False):
    """Single-n convenience wrapper over `pallas_topn_threshold_multi`."""
    return pallas_topn_threshold_multi(
        x, jnp.asarray([n]), iters=iters, interpret=interpret
    )[0]


def _bisect_kernel_batched(n_ref, x_ref, out_ref, *, iters: int, k: int):
    """One grid program per batch item: its volume block in VMEM; the target
    table and output live UNBLOCKED in SMEM, indexed by program id (TPU
    lowering rejects blocked SMEM specs whose trailing dims aren't (8, 128)
    multiples — full arrays are exempt; the grid is sequential, so each
    program's scalar stores persist)."""
    b = pl.program_id(0)
    x = x_ref[0]
    hi0 = jnp.max(x)

    for j in range(k):  # static unroll over the requested Ns
        n = n_ref[b, j]

        def body(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            cnt = jnp.sum((x >= mid).astype(jnp.float32))
            ok = cnt >= n
            return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

        lo, _ = jax.lax.fori_loop(0, iters, body, (jnp.zeros_like(hi0), hi0))
        out_ref[b, j] = lo


@partial(jax.jit, static_argnames=("iters", "interpret"))
def pallas_topn_threshold_multi_batched(x, ns, *, iters: int = 26,
                                        interpret: bool = False):
    """Batched thresholds (B, K): per item b and target n = ns[b, k], the
    largest t with count(x[b] >= t) >= n.

    Grid = (B,): each program loads ITS volume into VMEM once and runs all K
    bisections on-chip. This is the batch-inside-the-kernel form — vmapping
    `pallas_topn_threshold_multi` trips a block-shape error on real TPU
    lowering (SMEM operands cannot be batched by vmap).
    """
    B = x.shape[0]
    flat = x.reshape(B, -1).astype(jnp.float32)
    V = flat.shape[1]
    rows = -(-V // LANES)
    rows_pad = -(-rows // SUBLANES) * SUBLANES
    padded = jnp.zeros((B, rows_pad * LANES), jnp.float32).at[:, :V].set(flat)
    padded = padded.reshape(B, rows_pad, LANES)
    ns = jnp.asarray(ns, jnp.float32).reshape(B, -1)
    k = ns.shape[1]

    return pl.pallas_call(
        partial(_bisect_kernel_batched, iters=iters, k=k),
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B, k), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rows_pad, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=interpret,
    )(ns, padded)
