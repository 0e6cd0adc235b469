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
