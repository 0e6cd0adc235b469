"""Per-sample class weights from lesion prevalence.

Equivalent of the reference's imbalance handling
(``rsuper_train/training/dataset/dim3/dataset_abdomenatlas.py``:
``get_class_proportions`` :54 — per-lesion-class prevalence from the per-CT
metadata; ``get_sample_weight`` :120 — inverse-prevalence weights per sample,
normalised to sum to C). Enabled via ``--class_weights`` in the reference;
`TrainConfig.class_weights` here.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np
import pandas as pd


def lesion_class_to_organ(name: str) -> str:
    return (name.replace("_lesion", "").replace("pancreatic", "pancreatic")
            .replace("_", " "))


def class_proportions(
    per_ct: pd.DataFrame,
    sample_ids: Sequence[str],
    lesion_class_names: Sequence[str],
) -> Dict[str, float]:
    """Fraction of samples positive for each lesion class (+ 'healthy')."""
    if "BDMAP ID" in per_ct.columns:
        per_ct = per_ct.rename(columns={"BDMAP ID": "BDMAP_ID"})
    rows = per_ct[per_ct["BDMAP_ID"].isin(set(sample_ids))]
    total = max(len(rows), 1)
    props: Dict[str, float] = {}
    pos_any = np.zeros(len(rows), bool)
    for cls in lesion_class_names:
        organ = lesion_class_to_organ(cls)
        col = f"number of {organ} lesion instances"
        if col not in rows.columns:
            props[cls] = 0.0
            continue
        pos = pd.to_numeric(rows[col], errors="coerce").fillna(0) >= 1
        props[cls] = float(pos.sum()) / total
        pos_any |= pos.values
    props["healthy"] = float((~pos_any).sum()) / total
    return props


def sample_class_weights(
    labels: np.ndarray,
    proportions: Dict[str, float],
    class_names: Sequence[str],
    eps: float = 1e-4,
) -> np.ndarray:
    """Inverse-prevalence weight per class for ONE sample's labels (C, D, H, W),
    normalised to sum to C (reference ``get_sample_weight``)."""
    weights = []
    for i, c in enumerate(class_names):
        if c in proportions:
            p = proportions[c]
            positive = labels[i].sum() > 0
            weights.append(1.0 / (eps + (p if positive else 1.0 - p)))
        else:
            weights.append(1.0)
    w = np.asarray(weights, np.float32)
    return w / w.sum() * len(class_names)
