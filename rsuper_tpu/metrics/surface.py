"""Surface-distance metrics: average surface distance + robust (95%) Hausdorff.

The reference vendors Google DeepMind's surface-distance library
(``rsuper_train/metric/metrics.py`` + 256-entry surfel-area lookup tables).
This implementation uses the Euclidean-distance-transform formulation
(surface voxels = mask minus its erosion; distances from the EDT of the
complementary surface), the standard definition used by most medical-imaging
eval suites. Spacing-aware via `sampling`. NaN→clamp handling mirrors the
reference's validation path (``training/validation.py``: empty masks → 500).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
from scipy import ndimage as ndi

MAX_DISTANCE = 500.0


def _surface(mask: np.ndarray) -> np.ndarray:
    m = mask.astype(bool)
    if not m.any():
        return m
    return m & ~ndi.binary_erosion(m)


def surface_distances(
    pred: np.ndarray, target: np.ndarray, sampling: Sequence[float] = (1.0, 1.0, 1.0)
) -> Tuple[np.ndarray, np.ndarray]:
    """(distances pred-surface→target-surface, target-surface→pred-surface)."""
    ps, ts = _surface(pred), _surface(target)
    if not ps.any() or not ts.any():
        return np.array([MAX_DISTANCE]), np.array([MAX_DISTANCE])
    dt_t = ndi.distance_transform_edt(~ts, sampling=sampling)
    dt_p = ndi.distance_transform_edt(~ps, sampling=sampling)
    return dt_t[ps], dt_p[ts]


def average_surface_distance(pred, target, sampling=(1.0, 1.0, 1.0)) -> float:
    d_pt, d_tp = surface_distances(pred, target, sampling)
    return float(min((d_pt.mean() + d_tp.mean()) / 2.0, MAX_DISTANCE))


def hausdorff95(pred, target, sampling=(1.0, 1.0, 1.0)) -> float:
    d_pt, d_tp = surface_distances(pred, target, sampling)
    h = max(np.percentile(d_pt, 95), np.percentile(d_tp, 95))
    return float(min(h, MAX_DISTANCE))


def normalized_surface_dice(pred, target, tolerance: float = 1.0,
                            sampling=(1.0, 1.0, 1.0)) -> float:
    """NSD @ tolerance (mm): fraction of both masks' surface points lying
    within `tolerance` of the other mask's surface — the DeepMind
    surface-dice definition the reference's vendored library computes
    (``rsuper_train/metric/metrics.py`` compute_surface_dice_at_tolerance),
    on the EDT formulation. Both-empty masks score 1.0; one-empty scores
    0.0 (no surface within any finite tolerance)."""
    p = np.asarray(pred).astype(bool)
    t = np.asarray(target).astype(bool)
    if not p.any() and not t.any():
        return 1.0
    if not p.any() or not t.any():
        return 0.0
    d_pt, d_tp = surface_distances(p, t, sampling)
    ok = float((d_pt <= tolerance).sum() + (d_tp <= tolerance).sum())
    return ok / float(d_pt.size + d_tp.size)
