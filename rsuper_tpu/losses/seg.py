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
    including the optional elementwise ``weight``)."""
    x = logits.astype(jnp.float32)
    z = targets.astype(jnp.float32)
    loss = jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if weight is not None:
        loss = loss * weight
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
        w = class_weights[:, None, None, None, :].astype(jnp.float32)
    loss = bce_with_logits(logits, targets, weight=w)
    return jnp.mean(loss * known_voxels.astype(jnp.float32))


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
    p = jax.nn.sigmoid(preds.astype(jnp.float32)) if sigmoid else preds.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    k = known_voxels.astype(jnp.float32)
    p = p * k
    t = t * k

    tp = p * t
    fp = p * (1.0 - t)
    fn = (1.0 - p) * t

    # alpha over the global batch, per class (axes B + spatial)
    fp_c = jnp.sum(fp, axis=(0,) + _SPATIAL)
    fn_c = jnp.sum(fn, axis=(0,) + _SPATIAL)
    alpha = jnp.clip(fp_c / (fp_c + fn_c + smooth), 0.2, 0.8)  # (C,)
    beta = 1.0 - alpha

    num = jnp.sum(tp, axis=_SPATIAL)  # (B, C)
    den = num + alpha[None] * jnp.sum(fp, axis=_SPATIAL) + beta[None] * jnp.sum(
        fn, axis=_SPATIAL
    )
    loss = 1.0 - num / (den + smooth)  # (B, C)
    if class_weights is not None:
        loss = loss * class_weights.astype(jnp.float32)
    if reduce:
        return jnp.mean(loss)
    return loss
