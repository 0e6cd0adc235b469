"""Classification-branch loss (MTL baseline).

Reference: ``rsuper_train/training/losses_foundation.py:614-664``
(``classification_loss``): multi-label BCE on per-lesion-class presence derived
from the labels (plus the chosen segment mask for report items); channels that
are unknown in this crop and not positive are masked out of the loss.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .lesions import LesionChannelMap
from .seg import bce_with_logits

_SPATIAL = (1, 2, 3)


def classification_loss(
    cls_logits,
    labels,
    unk_voxels,
    chosen_segment_mask,
    lmap: LesionChannelMap,
    class_weights: Optional[jnp.ndarray] = None,
):
    """BCE-with-logits on lesion presence.

    Args:
      cls_logits: (B, Nc) where Nc = number of classes containing 'lesion'.
      labels / unk_voxels / chosen_segment_mask: (B, D, H, W, C) (mask may be None).
      class_weights: optional (B, Nc) elementwise BCE weight.
    """
    idx = list(lmap.lesion_class_indices())
    lab = labels[..., idx].astype(jnp.float32)
    if chosen_segment_mask is not None:
        lab = lab + chosen_segment_mask[..., idx].astype(jnp.float32)
    presence = (jnp.sum(lab, axis=_SPATIAL) > 0).astype(jnp.float32)  # (B, Nc)

    loss = bce_with_logits(cls_logits, presence, weight=class_weights)

    if unk_voxels is not None:
        unk_presence = (
            jnp.sum(unk_voxels[..., idx].astype(jnp.float32), axis=_SPATIAL) > 0
        ).astype(jnp.float32)
        known = ((1.0 - unk_presence) + presence > 0).astype(jnp.float32)
        loss = loss * known
    return jnp.mean(loss)
