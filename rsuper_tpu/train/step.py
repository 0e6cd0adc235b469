"""The jitted training step: forward → R-Super losses → grad → clip → update → EMA.

Reference hot loop: ``rsuper_train/train_ddp.py:235-360`` (``train_epoch``).
The torch version runs fp32 (AMP disabled as unstable, ``train_ddp.py:315``);
here the model computes in bf16 with float32 parameters, optimizer state and
loss accumulations — the bf16 exponent range makes this stable on TPU, and
the voxel-count-scale reductions inside the volume/ball losses are already
accumulated in float32 (see ``losses/``).

Parallelism: the step is ``jax.jit``-ed with explicit shardings — batch
arrays sharded over the mesh ``data`` axis, state replicated. XLA turns the
gradient averaging into an ICI all-reduce (the DDP equivalent,
SURVEY.md §2.4) with no user-level collectives.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..losses import LesionChannelMap, LossConfig, calculate_loss
from .state import TrainState


def _lift_2d(x):
    """(B, H, W, C) → (B, 1, H, W, C): 2D-pathway tensors become depth-1
    volumes so the loss stack (spatial axes (1, 2, 3)) serves both modes."""
    return x[:, None] if x is not None and x.ndim == 4 else x


def loss_fn(params, model, batch: Dict[str, Any], lmap: LesionChannelMap,
            cfg: LossConfig, model_genesis: bool = False,
            clip_only: bool = False, data_axis=None, spatial_mesh=None):
    out = model.apply(params, batch["image"])
    if spatial_mesh is not None:
        # spatial sharding stops at the model/loss boundary: gather each
        # volume over the mesh `model` axis so the branchy global losses
        # (FFT, top-N, sorts) run batch-sharded (parallel.mesh.gather_spatial)
        from ..parallel.mesh import gather_spatial

        out, batch = gather_spatial(out, batch, spatial_mesh)
    if batch["image"].ndim == 4 and not clip_only:  # 2D slices
        seg = out.get("segmentation")
        if isinstance(seg, (tuple, list)):
            out = {**out, "segmentation": [_lift_2d(h) for h in seg]}
        else:
            out = {**out, "segmentation": _lift_2d(seg)}
        batch = {
            **batch,
            **{k: _lift_2d(batch.get(k))
               for k in ("label", "unk", "segment_mask")},
        }
    losses = calculate_loss(
        out,
        batch.get("label"),
        batch.get("unk"),
        batch.get("segment_mask"),
        batch.get("volumes"),
        batch.get("diameters"),
        lmap,
        cfg,
        class_weights=batch.get("class_weights"),
        model_genesis=model_genesis,
        clip_only=clip_only,
        report_embeddings=batch.get("report_embedding"),
        data_axis=data_axis,
    )
    return losses["overall"], losses


def build_train_step(
    model,
    lmap: LesionChannelMap,
    cfg: LossConfig = LossConfig(),
    mesh: Optional[Mesh] = None,
    ema_alpha: float = 0.99,
    model_genesis: bool = False,
    clip_only: bool = False,
    state_shardings=None,
):
    """Returns ``step(state, batch) -> (state, metrics)``, jitted.

    With a `mesh`, inputs/outputs carry NamedShardings (batch over 'data',
    state replicated) so the same compiled step runs 1..N chips. Pass
    `state_shardings` (e.g. ``parallel.mesh.zero_state_shardings``) to
    override the replicated state placement — ZeRO-1 optimizer sharding.

    A mesh with a >1 ``model`` axis turns on *spatial* (context-parallel)
    sharding: volumetric batch arrays are constrained to shard their depth
    axis over ``model`` (``parallel.mesh.spatial_constraint``) and GSPMD
    partitions the model's convs/norms/attention with halo exchanges and
    psums over ICI. Pallas kernels are disabled only for this step's trace
    (custom calls cannot be partitioned; ``ops/dispatch.py``) — other
    functions traced in the same process (validation's un-sharded sliding
    window, non-spatial steps) keep them.
    """
    spatial = mesh is not None and mesh.shape.get("model", 1) > 1
    if spatial:
        from ..parallel.mesh import spatial_constraint

    def train_step(state: TrainState, batch):
        if spatial:
            batch = spatial_constraint(batch, mesh)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, losses), grads = grad_fn(
            state.params, model, batch, lmap, cfg,
            model_genesis, clip_only, None, mesh if spatial else None,
        )
        state = state.apply_gradients(grads, ema_alpha=ema_alpha)
        return state, losses

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    state_sh = state_shardings if state_shardings is not None else repl
    jitted = jax.jit(
        train_step,
        in_shardings=(state_sh, data),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )
    if not spatial:
        return jitted

    def spatial_step(state, batch):
        # the dispatch flag is consulted at TRACE time; scoping it to the
        # call covers the first-call trace and is a no-op on cache hits
        from ..ops.dispatch import pallas_disabled

        with pallas_disabled():
            return jitted(state, batch)

    return spatial_step


def build_eval_step(model, mesh: Optional[Mesh] = None, use_ema: bool = False):
    """Jitted forward pass returning sigmoid probabilities of the final head."""

    def eval_step(state: TrainState, image):
        params = state.ema_params if use_ema else state.params
        out = model.apply(params, image)["segmentation"]
        logits = out[0] if isinstance(out, (list, tuple)) else out
        return jax.nn.sigmoid(logits)

    if mesh is None:
        return jax.jit(eval_step)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(eval_step, in_shardings=(repl, data), out_shardings=data)
