from .dice import dice_score, dice_per_class
from .surface import surface_distances, average_surface_distance, hausdorff95

__all__ = [
    "dice_score",
    "dice_per_class",
    "surface_distances",
    "average_surface_distance",
    "hausdorff95",
]
