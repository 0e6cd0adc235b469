"""The loss dispatcher: aggregates segmentation, report (volume/ball),
classification, CLIP and Model-Genesis losses into one ``overall`` scalar.

Reference: ``rsuper_train/training/losses_foundation.py:685-1076``
(``calculate_loss``). Behavioural notes mirrored here:

* deep supervision: ``model_output['segmentation']`` may be a list/tuple of
  heads; head j is weighted by ``aux_weight[j]``;
* loss-type string semantics (``:923``): a loss containing ``'ball'`` uses the
  ball loss, except on non-final heads when it also contains ``'last'`` (then
  those heads fall back to the volume loss); ``'both'`` adds the volume loss
  on ball heads; anything else (``'dice'``) is volume loss only;
* segmentation loss per head = mean(masked BCE) + adaptive-Tversky Dice, both
  masked by known voxels = 1 - dilate(unk, 5);
* ball-loss sub-terms are weighted by ``ball_bce_weight`` / ``ball_dice_weight``;
* ``class_weights`` equal to all-ones are dropped (``:876``).

Static configuration lives in `LossConfig` (hashable; jit-static). The NaN
hard-abort of the reference (``:1070``) is incompatible with jit — the train
loop checks ``overall`` for NaN on the host and skips/raises there.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp

from .ball import BallLossConfig, ball_loss, lesion_masks_cf
from .classification import classification_loss
from .genesis import model_genesis_loss
from .info_nce import symmetric_info_nce
from .lesions import LesionChannelMap
from .seg import adaptive_tversky_dice, get_known_voxels, masked_bce_with_logits
from .volume import volume_loss


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Static loss hyper-parameters (reference CLI defaults,
    ``train_ddp.py:429-465`` and ``config/abdomenatlas_ufo/medformer_3d.yaml``)."""

    loss: str = "ball_dice_last"
    aux_weight: tuple = (0.5, 0.5)
    seg_loss: float = 1.0
    report_volume_loss_basic: float = 1.0
    volume_loss_tolerance: float = 0.2
    ball_bce_weight: float = 1.0
    ball_dice_weight: float = 1.0
    standard_ce_ball: bool = False
    ball_volume_margin: float = 0.2
    classification_branch: bool = False
    known_dilation: int = 5
    # static bound on ball-conv kernel diameter (voxels); sets the FFT padding
    # and clamps reported diameters — 64 covers clinical tumor sizes at 1 mm³
    ball_max_diameter: int = 64

    def ball_config(self) -> BallLossConfig:
        return BallLossConfig(
            diameter_margin=self.ball_volume_margin,
            volume_margin=self.ball_volume_margin,
            standard_ce=self.standard_ce_ball,
            apply_dice_loss=("dice" in self.loss),
            max_diameter=self.ball_max_diameter,
        )


def _head_uses_ball(cfg: LossConfig, head_idx: int) -> bool:
    is_ball = ("ball" in cfg.loss) or ("dynamic" in cfg.loss) or ("dll" in cfg.loss)
    if not is_ball:
        return False
    if head_idx != 0 and "last" in cfg.loss:
        return False
    return True


def calculate_loss(
    model_output: Dict[str, Any],
    label,
    unk_voxels,
    chosen_segment_mask,
    tumor_volumes,
    tumor_diameters,
    lmap: LesionChannelMap,
    cfg: LossConfig = LossConfig(),
    class_weights=None,
    model_genesis: bool = False,
    clip_only: bool = False,
    report_embeddings=None,
    data_axis: Optional[str] = None,
) -> Dict[str, jnp.ndarray]:
    """Compute every active loss for one training step; returns a dict with an
    ``'overall'`` key (differentiable sum of all terms).

    All volumetric tensors are channels-last ``(B, D, H, W, C)``.
    `tumor_volumes`: (B, T); `tumor_diameters`: (B, T, 3);
    `class_weights`: optional (B, C).
    """
    if model_genesis:
        return model_genesis_loss(model_output["segmentation"], label)

    if clip_only:
        loss = symmetric_info_nce(
            model_output["clip"], report_embeddings, axis_name=data_axis
        )
        return {"contrastive_loss": loss, "overall": loss}

    result = model_output["segmentation"]
    heads: Sequence = result if isinstance(result, (tuple, list)) else [result]
    heads = [h for h in heads if h is not None]

    if unk_voxels is not None:
        known = get_known_voxels(unk_voxels, dilation=cfg.known_dilation)
    else:
        known = jnp.ones_like(label, dtype=jnp.float32)

    losses: Dict[str, jnp.ndarray] = {}
    loss_seg_total = jnp.zeros(())
    use_report = cfg.report_volume_loss_basic > 0

    # lesion-space masks (incl. the expensive dilation-31) are pure batch
    # data: compute once, share across every head's ball/volume loss
    pre = None
    if use_report:
        bc = cfg.ball_config()
        pre = lesion_masks_cf(
            label, unk_voxels, chosen_segment_mask, lmap,
            bc.subseg_dilation, bc.unk_dilation,
        )

    for j, logits in enumerate(heads):
        w = cfg.aux_weight[j] if len(heads) > 1 else 1.0

        # ---- report losses --------------------------------------------------
        if use_report:
            report_terms: Dict[str, jnp.ndarray] = {}
            if _head_uses_ball(cfg, j):
                bl = ball_loss(
                    logits,
                    label,
                    unk_voxels,
                    chosen_segment_mask,
                    tumor_volumes,
                    tumor_diameters,
                    lmap,
                    cfg.ball_config(),
                    class_weights=class_weights,
                    precomputed=pre,
                )
                report_terms["ball_loss_bce"] = bl["ball_loss_bce"] * cfg.ball_bce_weight
                report_terms["ball_loss_dice"] = (
                    bl["ball_loss_dice"] * cfg.ball_dice_weight
                )
                if "both" in cfg.loss:
                    report_terms["dice_volume_loss"] = volume_loss(
                        logits,
                        chosen_segment_mask,
                        tumor_volumes,
                        label,
                        unk_voxels,
                        lmap,
                        tolerance=cfg.volume_loss_tolerance,
                        class_weights=class_weights,
                        precomputed=pre,
                    )
            else:
                report_terms["dice_volume_loss"] = volume_loss(
                    logits,
                    chosen_segment_mask,
                    tumor_volumes,
                    label,
                    unk_voxels,
                    lmap,
                    tolerance=cfg.volume_loss_tolerance,
                    class_weights=class_weights,
                    precomputed=pre,
                )
            for key, val in report_terms.items():
                val = w * cfg.report_volume_loss_basic * val
                losses[key] = losses.get(key, jnp.zeros(())) + val

        # ---- segmentation loss ---------------------------------------------
        seg = masked_bce_with_logits(
            logits, label, known, class_weights=class_weights
        ) + adaptive_tversky_dice(
            logits, label, known, sigmoid=True, class_weights=class_weights
        )
        loss_seg_total = loss_seg_total + w * cfg.seg_loss * seg

    losses["segmentation"] = loss_seg_total

    if cfg.classification_branch and "classification" in model_output:
        losses["classification"] = classification_loss(
            model_output["classification"],
            label,
            unk_voxels,
            chosen_segment_mask,
            lmap,
        )

    overall = jnp.zeros(())
    for v in losses.values():
        overall = overall + v
    losses["overall"] = overall
    return losses
