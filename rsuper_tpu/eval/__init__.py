from .detection import detect_volumes, detection_table
from .sens_spec import evaluate_detection, sensitivity_specificity_f1, prob_auc

__all__ = [
    "detect_volumes",
    "detection_table",
    "evaluate_detection",
    "sensitivity_specificity_f1",
    "prob_auc",
]
