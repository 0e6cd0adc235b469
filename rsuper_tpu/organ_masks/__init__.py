from .labels import (
    SUBSEG_LABELS,
    REGION_LABELS,
    split_label_map,
    combine_label_maps,
    merged_organ,
)

__all__ = [
    "SUBSEG_LABELS",
    "REGION_LABELS",
    "split_label_map",
    "combine_label_maps",
    "merged_organ",
]
