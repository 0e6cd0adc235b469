"""Device mesh and sharding helpers.

The reference scales with one process per GPU + NCCL DDP
(``rsuper_train/train_ddp.py:623-668``: ``mp.spawn`` → ``init_process_group``
→ ``DistributedDataParallel`` + rank-sliced samplers). The TPU-native
equivalent is SPMD: ONE process per host, a ``jax.sharding.Mesh`` over all
chips, batch sharded over the ``data`` axis, parameters replicated, and XLA
inserting the gradient all-reduce over ICI automatically from the sharding
annotations — no process spawner, no explicit collectives in user code.

A ``model`` axis is part of the mesh layout from day one so tensor/spatial
sharding can be introduced without re-plumbing callers (for 3D CNNs the
natural second axis is *spatial* sharding of the volume — the CNN analogue of
context parallelism; SURVEY.md §2.4).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a (data, model) mesh over `devices` (default: all)."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    assert data * model == len(devices), (
        f"mesh {data}x{model} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place every array in a batch pytree with its leading axis sharded over
    the data axis (host → device transfer included)."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def spatial_constraint(batch, mesh: Mesh):
    """Constrain volumetric batch arrays to *spatial* (context-parallel)
    sharding: depth (axis 1 of (B, D, H, W, C); rows of 2D (B, H, W, C))
    sharded over the ``model`` axis, batch over ``data``.

    Annotation-only by design — XLA's SPMD partitioner derives everything
    else from these constraints: convolutions become shard-local convs with
    halo exchanges over ICI, instance-norm reductions become cross-shard
    ``psum``s, and attention over the flattened volume re-gathers only where
    the einsum actually needs the full extent. This is the CNN analogue of
    context parallelism (SURVEY.md §2.4): a single 128³ patch's activations
    (~4× a 96³ patch) split across chips instead of replicating.

    Non-volumetric leaves (volumes/diameters/class weights) stay
    batch-sharded. Pallas kernels must be OFF under this mode — a custom
    call cannot be partitioned (``ops/dispatch.py``).

    CORRECTNESS BOUND (measured, tests/test_train.py): XLA SPMD conv
    *gradients* are exact (~4e-5 abs) only while every feature map keeps
    **≥ 2 planes per shard**. At exactly 1 plane/shard grads are silently
    3-7× WRONG (loss still matches!), and with an all-padding empty shard
    (sharded extent < shard count) they were 5000× off. The zoo downsamples
    depth ≤16×, so ``train()`` enforces
    ``training_size[0] // 16 >= 2 * spatial_shard``.
    """
    vol = NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))
    dat = NamedSharding(mesh, P(DATA_AXIS))

    def leaf(x):
        if x is None:
            return x
        sh = vol if getattr(x, "ndim", 0) >= 4 else dat
        return jax.lax.with_sharding_constraint(x, sh)

    return jax.tree.map(leaf, batch)


def gather_spatial(out, batch, mesh: Mesh):
    """Constrain loss inputs back to batch-only sharding at the model/loss
    boundary under spatial sharding.

    Spatial sharding exists for the MODEL's activations (the memory/compute
    bulk); the R-Super losses are branchy global ops — FFT localisation,
    top-N selection, whole-volume sorts — that GSPMD cannot usefully
    partition over depth (and the XLA:CPU fft thunk rejects the non-default
    layouts partitioned FFTs get assigned). Constraining the model outputs
    and loss-consumed batch arrays to ``P(data)`` makes XLA all-gather each
    volume over the ``model`` axis exactly once, after which the loss stack
    runs identically to pure data parallelism. The gather's transpose
    re-shards the cotangent into the model, so gradient parity is preserved
    (tests/test_train.py::test_train_step_spatial_sharding).
    """
    dat = NamedSharding(mesh, P(DATA_AXIS))

    def leaf(x):
        if x is None or getattr(x, "ndim", 0) < 1:
            return x
        return jax.lax.with_sharding_constraint(x, dat)

    return jax.tree.map(leaf, out), jax.tree.map(leaf, batch)


def zero_sharding_tree(mesh: Mesh, tree, min_size: int = 16384):
    """ZeRO-1-style sharding specs for an optimizer-state pytree: each large
    leaf is sharded over the ``data`` axis along its largest divisible
    dimension; small leaves (scalars, norm stats, counts) stay replicated.

    Annotation-only by design: XLA's SPMD partitioner turns the replicated
    gradients + sharded Adam moments into a reduce_scatter → shard-local
    update → all_gather(update) pattern over ICI with no user collectives —
    the TPU-native equivalent of the reference's (absent) optimizer sharding,
    cutting the 2x-params f32 Adam state per chip by the data-axis size.
    """
    n = mesh.shape[DATA_AXIS]
    repl = NamedSharding(mesh, P())

    def leaf(x):
        shape = tuple(getattr(x, "shape", ()))
        if shape and int(np.prod(shape)) >= min_size:
            for a in sorted(range(len(shape)), key=lambda a: -shape[a]):
                if shape[a] % n == 0:
                    spec = [None] * len(shape)
                    spec[a] = DATA_AXIS
                    return NamedSharding(mesh, P(*spec))
        return repl

    return jax.tree.map(leaf, tree)


def zero_state_shardings(mesh: Mesh, state, shard_ema: bool = False,
                         shard_opt: bool = True):
    """Sharding pytree for a ``TrainState`` under ZeRO-1: optimizer state
    sharded over ``data`` (``shard_opt``), params / step replicated.
    ``shard_ema`` extends the sharding to the EMA copy (another 1× params of
    f32 per chip ÷ the data-axis size): the EMA update is elementwise, so
    with replicated params XLA just slices them shard-locally — zero
    collectives in the step; the one cost is an all_gather when the EMA
    weights are *used* (validation / export), which ``train()`` issues
    explicitly via ``gather_tree``. Both default conservative so eval paths
    keep working unchanged."""
    repl = NamedSharding(mesh, P())
    return state.replace(
        params=jax.tree.map(lambda _: repl, state.params),
        opt_state=(zero_sharding_tree(mesh, state.opt_state) if shard_opt
                   else jax.tree.map(lambda _: repl, state.opt_state)),
        ema_params=(
            (zero_sharding_tree(mesh, state.ema_params) if shard_ema
             else jax.tree.map(lambda _: repl, state.ema_params))
            if state.ema_params is not None else None
        ),
        step=repl,
    )


@functools.lru_cache(maxsize=8)
def _gather_jit(mesh: Mesh):
    # one jitted identity per mesh (reused across calls/epochs so the
    # per-validation EMA gather hits the in-process jit cache instead of
    # re-tracing — and re-compiling through the remote-TPU relay)
    repl = NamedSharding(mesh, P())
    # a single sharding is a valid pytree prefix: applies to every leaf
    return jax.jit(lambda t: t, out_shardings=repl)


def gather_tree(tree, mesh: Mesh):
    """Materialise a (possibly sharded) pytree as replicated over `mesh`.

    A jitted identity with replicated out_shardings — XLA compiles it to an
    all_gather over ICI, and it works in multi-host jobs where a host-side
    ``device_get`` of non-addressable shards would not."""
    return _gather_jit(mesh)(tree)
