"""Multi-host (multi-process) SPMD training.

The reference scales past one node with torch DDP's process-group plumbing:
``--world_size/--rank/--dist_url`` flags (``rsuper_train/train_ddp.py:423-426``)
feeding ``init_process_group`` inside the per-GPU spawn (``:623-628``), plus
rank-sliced samplers. The TPU-native equivalent keeps the SPMD single-program
model: ``jax.distributed.initialize`` connects one process per host, ONE
global ``Mesh`` spans every chip of every host, each process feeds only its
local shard of the global batch (``jax.make_array_from_process_local_data``),
and XLA emits the cross-host collectives (gradient all-reduce over ICI within
a slice, DCN across slices) from the same sharding annotations used
single-host — zero user-level communication code.

Process mapping: process i serves data shard i of `num_processes`
(`ChunkedSampler(shard=i, num_shards=n)`), checkpoints are written by process
0 only (state is fully replicated, so its local view is complete).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .mesh import batch_sharding


def init_distributed(
    coordinator: str,
    num_processes: int,
    process_id: int,
    local_device_ids: Optional[str] = None,
) -> tuple[int, int]:
    """Connect this process to the training job; returns (index, count).

    Call BEFORE any other jax API touches the backend. `coordinator` is
    ``host:port`` of process 0 (the reference's ``--dist_url`` analogue).
    """
    kwargs = {}
    if local_device_ids:
        kwargs["local_device_ids"] = [
            int(x) for x in str(local_device_ids).split(",")
        ]
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    # establish the collective context NOW, while the processes are aligned:
    # the backend's transport rendezvous (e.g. Gloo full-mesh connect on CPU)
    # has a short deadline, and the first organic collective only fires after
    # each process's multi-minute jit compile — any compile skew past the
    # deadline would kill the job at step 1
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("rsuper_init")
    return jax.process_index(), jax.process_count()


def process_info() -> tuple[int, int]:
    return jax.process_index(), jax.process_count()


def is_primary() -> bool:
    return jax.process_index() == 0


def local_batch_to_global(batch, mesh):
    """Assemble a globally data-sharded batch from this process's LOCAL
    arrays (leading axis = local batch = global batch / process_count).

    Single-process meshes fall back to a plain sharded device_put — the two
    paths produce identical Arrays there.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch,
    )


def global_key_slices(keys, mesh):
    """Globally shard per-item PRNG keys computed identically on every host:
    each process contributes its slice of the (B_global, 2) key array."""
    if jax.process_count() == 1:
        return jax.device_put(keys, batch_sharding(mesh))
    n = jax.process_count()
    i = jax.process_index()
    local = np.asarray(keys).reshape(n, -1, *np.asarray(keys).shape[1:])[i]
    return jax.make_array_from_process_local_data(batch_sharding(mesh), local)
