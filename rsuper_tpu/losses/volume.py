"""The R-Super Volume Loss.

Compares the report's total tumor volume against the network's predicted soft
volume inside the (dilated) organ sub-segment the report points at.
Reference: ``rsuper_train/training/losses_foundation.py:250-395``
(``volume_loss_basic`` + ``dice_based_volume_loss``, MICCAI paper Fig. 1).

Channels-last ``(B, D, H, W, C)``; the lesion-channel merge is a static
`LesionChannelMap`. Note: the reference also computes ``negative_voxels`` /
``out_in_negative_voxels`` and a dilation of ``unk`` (:310-330) that never
feed the returned loss — that dead code is intentionally dropped here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.morphology import dilate_cf
from .lesions import LesionChannelMap

_SP3 = (-3, -2, -1)  # spatial axes in the channel-first internal layout


def dice_based_volume_loss(pred_volume, target_volume, tolerance: float = 0.1, E: float = 500.0):
    """|V̂−V| / (V̂+V+E), shifted down by its value at the tolerance boundary
    (for continuity) and clamped to [0, 1].

    (``losses_foundation.py:352-395``; E keeps the loss finite at V=0, the
    max(·, min(V, 100)) keeps the dead-zone from collapsing for tiny tumors.)
    Inputs broadcast; returns elementwise loss.
    """
    x = pred_volume.astype(jnp.float32)
    y = target_volume.astype(jnp.float32)
    loss = jnp.abs(x - y) / (x + y + E)
    v = jnp.maximum((1.0 - tolerance) * y, jnp.minimum(y, 100.0))
    loss_at_tol = jnp.abs(v - y) / (v + y + E)
    return jnp.clip(loss - loss_at_tol, 0.0, 1.0)


def volume_loss(
    logits,
    chosen_segment_mask,
    tumor_volumes,
    labels,
    unk_voxels,
    lmap: LesionChannelMap,
    *,
    dilation_segment: int = 31,
    tolerance: float = 0.1,
    E: float = 500.0,
    class_weights=None,
    precomputed=None,
):
    """R-Super Volume Loss (``volume_loss_basic``, ``losses_foundation.py:250``).

    Args:
      logits: (B, D, H, W, C) raw network output.
      chosen_segment_mask: (B, D, H, W, C) binary; 1 on the organ sub-segment
        the report's tumors lie in (a single lesion channel is active).
      tumor_volumes: (B, T) report volumes in voxels (1 mm³ spacing), zero-padded.
      labels: (B, D, H, W, C) per-voxel one-hot labels (zero for CT-Report data).
      unk_voxels: (B, D, H, W, C) binary unknown-voxel mask (unused by the loss
        itself — kept for signature parity; see module docstring).
      lmap: static lesion-channel map.
      class_weights: optional (B, C).
      precomputed: optional `ball.lesion_masks_cf` result shared across heads
        (its dilated segment mask uses the same kernel 31).

    Returns scalar loss.
    """
    del unk_voxels  # dead code in the reference; see module docstring
    # Internal layout is channel-first (B, L, D, H, W): the lesion channel
    # count is tiny (~3); keeping it in the TPU lane dim would pad every
    # stored temp ~42x (the OOM class of bug found on v5e).
    to_cf = lambda t: jnp.moveaxis(t, -1, 1)
    out = to_cf(lmap.merge(logits))  # max of logits == logit of max prob
    if precomputed is not None:
        seg, _, lab = precomputed
    else:
        seg = dilate_cf(to_cf(lmap.merge(chosen_segment_mask)).astype(jnp.float32),
                        dilation_segment)
        lab = to_cf(lmap.merge(labels))

    out = jax.nn.sigmoid(out.astype(jnp.float32))

    # channels already annotated per-voxel are excluded from report supervision
    per_voxel_positive = (
        jnp.sum(lab.astype(jnp.float32), axis=_SP3, keepdims=True) > 0
    ).astype(jnp.float32)
    out = out * (1.0 - per_voxel_positive)

    pred_vol = jnp.sum(out * seg, axis=_SP3)  # (B, L)

    report_vol = jnp.sum(tumor_volumes.astype(jnp.float32), axis=-1, keepdims=True)
    gate = (jnp.sum(seg, axis=_SP3) > 0).astype(jnp.float32)  # (B, L)
    report_vol = report_vol * gate

    loss = dice_based_volume_loss(pred_vol, report_vol, tolerance=tolerance, E=E)
    if class_weights is not None:
        loss = loss * lmap.merge(class_weights.astype(jnp.float32))
    return jnp.mean(loss)
