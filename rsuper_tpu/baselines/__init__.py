from .model_genesis import generate_restoration_pair
from .pseudo_labels import extract_lesion_candidates, refine_with_report

__all__ = [
    "generate_restoration_pair",
    "extract_lesion_candidates",
    "refine_with_report",
]
