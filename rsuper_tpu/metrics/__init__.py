from .dice import dice_score, dice_per_class
from .surface import (surface_distances, average_surface_distance,
                      hausdorff95, normalized_surface_dice)

__all__ = [
    "dice_score",
    "dice_per_class",
    "surface_distances",
    "average_surface_distance",
    "normalized_surface_dice",
    "hausdorff95",
]
