from .seg import masked_bce_with_logits, adaptive_tversky_dice, get_known_voxels
from .volume import dice_based_volume_loss, volume_loss
from .ball import ball_loss, isolate_tumor
from .lesions import LesionChannelMap
from .dispatcher import LossConfig, calculate_loss

__all__ = [
    "masked_bce_with_logits",
    "adaptive_tversky_dice",
    "get_known_voxels",
    "dice_based_volume_loss",
    "volume_loss",
    "ball_loss",
    "isolate_tumor",
    "LesionChannelMap",
    "LossConfig",
    "calculate_loss",
]
