"""Sensitivity / Specificity / F1 / AUROC against report ground truth.

Reference: ``rsuper_train/calculate_sensitivity_specificity_F1_AUC.py``:
ground truth is per-CT lesion presence (``number of {organ} lesion
instances`` >= 1 from the metadata CSV); for every confidence threshold's
detection table, sweep ~300 volume thresholds and report Sens/Spec/F1 per
organ, plus a voxel-probability AUROC from the maximum probabilities.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np
import pandas as pd
from sklearn.metrics import roc_auc_score

ORGANS = ("liver", "pancreatic", "kidney")
VOLUME_THRESHOLDS = tuple(np.unique(np.round(np.geomspace(1, 300000, 300))))


def load_ground_truth(per_ct_csv: str, organs: Sequence[str] = ORGANS) -> pd.DataFrame:
    gt = pd.read_csv(per_ct_csv)
    if "BDMAP ID" in gt.columns:
        gt = gt.rename(columns={"BDMAP ID": "BDMAP_ID"})
    out = gt[["BDMAP_ID"]].copy()
    for org in organs:
        col = f"number of {org} lesion instances"
        out[f"gt_{org}"] = (pd.to_numeric(gt[col], errors="coerce") >= 1).astype(float)
    return out


def prob_auc(gt: pd.DataFrame, preds: pd.DataFrame,
             organs: Sequence[str] = ORGANS) -> Dict[str, float]:
    merged = pd.merge(gt, preds, on="BDMAP_ID", how="inner")
    out = {}
    for org in organs:
        y = merged[f"gt_{org}"]
        p = merged[f"{org} tumor maximum probability"]
        mask = ~(y.isna() | p.isna())
        y, p = y[mask], p[mask]
        if y.nunique() < 2:
            out[org] = float("nan")
            continue
        try:
            out[org] = float(roc_auc_score(y, p))
        except ValueError:
            out[org] = float("nan")
    return out


def sensitivity_specificity_f1(
    gt_bin: np.ndarray, volumes: np.ndarray, volume_threshold: float
) -> Dict[str, float]:
    pred = volumes >= volume_threshold
    gt_bin = gt_bin.astype(bool)
    tp = int(np.sum(gt_bin & pred))
    fn = int(np.sum(gt_bin & ~pred))
    fp = int(np.sum(~gt_bin & pred))
    tn = int(np.sum(~gt_bin & ~pred))
    sens = tp / (tp + fn) if tp + fn else float("nan")
    spec = tn / (tn + fp) if tn + fp else float("nan")
    f1 = 2 * tp / (2 * tp + fp + fn) if 2 * tp + fp + fn else float("nan")
    return {"sens": sens, "spec": spec, "f1": f1, "tp": tp, "fp": fp,
            "fn": fn, "tn": tn}


def evaluate_detection(
    gt: pd.DataFrame,
    detection_tables: Dict[float, pd.DataFrame],
    organs: Sequence[str] = ORGANS,
    volume_thresholds: Sequence[float] = VOLUME_THRESHOLDS,
) -> Dict[float, pd.DataFrame]:
    """Per confidence threshold: a table over volume thresholds with
    Sens/Spec/F1 per organ (+ the scalar probability AUROC)."""
    first = detection_tables[min(detection_tables)]
    aucs = prob_auc(gt, first, organs)
    out = {}
    for conf, preds in detection_tables.items():
        merged = pd.merge(gt, preds, on="BDMAP_ID", how="inner")
        rows = []
        for vthr in volume_thresholds:
            row = {"threshold": float(vthr)}
            for org in organs:
                vols = pd.to_numeric(
                    merged[f"{org} tumor volume predicted"], errors="coerce"
                ).fillna(0).values
                m = sensitivity_specificity_f1(
                    merged[f"gt_{org}"].values, vols, vthr
                )
                row[f"{org}_sens"] = m["sens"]
                row[f"{org}_spec"] = m["spec"]
                row[f"{org}_f1"] = m["f1"]
                row[f"{org}_auc_prob"] = aucs[org]
            rows.append(row)
        out[conf] = pd.DataFrame(rows)
    return out


def best_f1(evaluated: Dict[float, pd.DataFrame],
            organ: str = "pancreatic") -> Dict[str, float]:
    """Best F1 (and its operating point) across confidence × volume sweeps."""
    best = {"f1": -1.0, "conf": None, "volume_threshold": None}
    for conf, df in evaluated.items():
        idx = df[f"{organ}_f1"].idxmax()
        if pd.isna(idx):
            continue
        f1 = df.loc[idx, f"{organ}_f1"]
        if f1 > best["f1"]:
            best = {"f1": float(f1), "conf": conf,
                    "volume_threshold": float(df.loc[idx, "threshold"])}
    return best
