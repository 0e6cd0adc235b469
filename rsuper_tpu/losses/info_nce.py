"""Symmetric InfoNCE for the CLIP-style pretraining baseline.

Reference: ``rsuper_train/training/info_nce.py:63-118`` (implicit-negative
mode: off-diagonal positives act as negatives) and the clip path of
``calculate_loss`` (``losses_foundation.py:841-856``): the loss is computed
symmetrically (ct→report and report→ct) and scaled by the data-parallel world
size to compensate for embedding all-gathers.

TPU-first: the cross-device negative pool is an ``all_gather`` over the data
mesh axis (pass ``axis_name`` inside ``shard_map``/``pjit``) instead of a
torch.distributed gather.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _l2norm(x, eps=1e-12):
    """NaN-safe L2 normalisation: ``x / max(||x||, eps)`` written so the
    gradient at x = 0 is finite. The naive form differentiates
    ``norm = sqrt(sum(x²))`` whose VJP is x/norm = 0/0 at zero — and a CLIP
    head whose spatial pooling collapses to one voxel outputs EXACTLY zero at
    init (instance norm of a single token), so the first backward pass would
    poison the weights with NaNs."""
    sq = jnp.sum(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, eps * eps))


def info_nce(query, positive_key, temperature: float = 0.1):
    """Implicit-negative InfoNCE: logits = normalized q @ k.T / T, labels = diag."""
    q = _l2norm(query.astype(jnp.float32))
    k = _l2norm(positive_key.astype(jnp.float32))
    logits = (q @ k.T) / temperature
    labels = jnp.arange(q.shape[0])
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(logp[jnp.arange(q.shape[0]), labels])


def symmetric_info_nce(
    ct_embeddings,
    report_embeddings,
    temperature: float = 0.1,
    axis_name: Optional[str] = None,
):
    """0.5 * (ct→rep + rep→ct); with `axis_name`, negatives are pooled across
    the mesh axis and the loss is scaled by the axis size (reference
    ``losses_foundation.py:851-854``)."""
    scale = 1.0
    if axis_name is not None:
        ct_all = jax.lax.all_gather(ct_embeddings, axis_name, tiled=True)
        rep_all = jax.lax.all_gather(report_embeddings, axis_name, tiled=True)
        scale = jax.lax.psum(1, axis_name)
    else:
        ct_all, rep_all = ct_embeddings, report_embeddings
    loss = 0.5 * (
        info_nce(ct_all, rep_all, temperature)
        + info_nce(rep_all, ct_all, temperature)
    )
    return loss * scale
