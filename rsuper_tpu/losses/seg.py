"""Segmentation losses: masked BCE-with-logits and adaptive-Tversky Dice.

Reference: ``rsuper_train/training/losses_foundation.py``
* ``get_known_voxels`` (:150) — voxels whose ground truth is certain;
* ``DiceLossMultiClass`` (:541) — Tversky loss whose alpha is derived from
  the batch-global FP/FN balance per class, clamped to [0.2, 0.8];
* BCE path of ``calculate_loss`` (:945-956).

All tensors are channels-last ``(B, D, H, W, C)``; reductions over the three
spatial axes are ``axis=(1, 2, 3)``. Accumulations run in float32 regardless
of the compute dtype (128³ voxel sums overflow bf16 precision).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.morphology import dilate_cf

_SPATIAL = (1, 2, 3)


def bce_with_logits(logits, targets, weight=None):
    """Elementwise numerically-stable binary cross-entropy on logits
    (torch ``F.binary_cross_entropy_with_logits(reduction='none')`` semantics,
    including the optional elementwise ``weight``).

    Computes in the INPUT dtype: bf16 logits keep the whole elementwise
    pipeline (and its autodiff residuals) bf16 — half the HBM traffic over
    (B, 96³, C) — while callers reduce with float32 accumulators. f32 inputs
    (the golden tests) stay exact.
    """
    x = logits
    z = targets.astype(x.dtype)
    loss = jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if weight is not None:
        loss = loss * weight.astype(x.dtype)
    return loss


def bce_probs(probs, targets, eps: float = 1e-12):
    """Elementwise BCE on probabilities (torch ``F.binary_cross_entropy``)."""
    p = jnp.clip(probs.astype(jnp.float32), eps, 1.0 - eps)
    z = targets.astype(jnp.float32)
    return -(z * jnp.log(p) + (1.0 - z) * jnp.log1p(-p))


def get_known_voxels(unk_voxels, dilation: int = 5):
    """known = 1 - dilate(unk, 5): the voxels standard losses may supervise.

    (``losses_foundation.py:150-199``; unk marks organs whose tumors are only
    described in the report, not annotated per voxel.)
    """
    unk = unk_voxels.astype(jnp.float32)
    if dilation > 0:
        # dilate in spatial-minor layout: class counts in the lane dim would
        # pad every conv-adjacent buffer up to 8x on TPU
        unk = jnp.moveaxis(dilate_cf(jnp.moveaxis(unk, -1, 1), dilation), 1, -1)
    return 1.0 - unk


def masked_bce_with_logits(logits, targets, known_voxels, class_weights=None):
    """Mean BCE over all voxels, zeroed on unknown voxels.

    Matches ``calculate_loss``'s segmentation BCE (``losses_foundation.py:945-955``):
    the mean divides by the FULL voxel count, not the known count.
    `class_weights`: optional (B, C), broadcast spatially.
    """
    w = None
    if class_weights is not None:
        w = class_weights[:, None, None, None, :]
    loss = bce_with_logits(logits, targets, weight=w)
    # mean over the full voxel count with a float32 accumulator (bf16 cannot
    # hold a 128³-voxel sum)
    return jnp.mean(loss * known_voxels.astype(loss.dtype), dtype=jnp.float32)


def adaptive_tversky_dice(
    preds,
    targets,
    known_voxels,
    *,
    sigmoid: bool = True,
    class_weights=None,
    reduce: bool = True,
    smooth: float = 1e-5,
):
    """Tversky Dice with alpha auto-set to FP/(FP+FN) per class over the whole
    batch, clamped to [0.2, 0.8] (``DiceLossMultiClass``,
    ``losses_foundation.py:541-607``).

    preds/targets/known: (B, D, H, W, C). Returns scalar (reduce) or (B, C).
    """
    # elementwise pipeline in the input dtype (bf16 in training — halves the
    # HBM traffic and the autodiff residual footprint); every reduction
    # accumulates in float32
    p = jax.nn.sigmoid(preds) if sigmoid else preds
    t = targets.astype(p.dtype)
    k = known_voxels.astype(p.dtype)
    p = p * k
    t = t * k

    one = jnp.ones((), p.dtype)
    tp = p * t
    fp = p * (one - t)
    fn = (one - p) * t

    # alpha over the global batch, per class (axes B + spatial)
    fp_c = jnp.sum(fp, axis=(0,) + _SPATIAL, dtype=jnp.float32)
    fn_c = jnp.sum(fn, axis=(0,) + _SPATIAL, dtype=jnp.float32)
    alpha = jnp.clip(fp_c / (fp_c + fn_c + smooth), 0.2, 0.8)  # (C,)
    beta = 1.0 - alpha

    num = jnp.sum(tp, axis=_SPATIAL, dtype=jnp.float32)  # (B, C)
    den = (
        num
        + alpha[None] * jnp.sum(fp, axis=_SPATIAL, dtype=jnp.float32)
        + beta[None] * jnp.sum(fn, axis=_SPATIAL, dtype=jnp.float32)
    )
    loss = 1.0 - num / (den + smooth)  # (B, C)
    if class_weights is not None:
        loss = loss * class_weights.astype(jnp.float32)
    if reduce:
        return jnp.mean(loss)
    return loss
