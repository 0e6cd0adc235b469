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


def zero_state_shardings(mesh: Mesh, state):
    """Sharding pytree for a ``TrainState`` under ZeRO-1: optimizer state
    sharded over ``data``, params / EMA / step replicated (EMA and params
    stay replicated so multi-host validation's ``device_get`` and the
    sliding-window eval path keep working unchanged)."""
    repl = NamedSharding(mesh, P())
    return state.replace(
        params=jax.tree.map(lambda _: repl, state.params),
        opt_state=zero_sharding_tree(mesh, state.opt_state),
        ema_params=(
            jax.tree.map(lambda _: repl, state.ema_params)
            if state.ema_params is not None else None
        ),
        step=repl,
    )
