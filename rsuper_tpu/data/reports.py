"""Radiology-report supervision records.

Turns the per-tumor metadata CSV produced by the report-extraction pipeline
(columns: ``BDMAP_ID``, ``Standardized Organ``, ``Standardized Location``,
``Tumor Size (mm)`` ("a x b x c" or a single diameter), ``Unknow Tumor Size``,
``no lesion``) into per-case supervision: which organ sub-segments hold
tumors of known size, report volumes/diameters, and unknown-channel specs.

Behavioural equivalent of the reference's
``rsuper_train/training/dataset/dim3/dataset_abdomenatlas_UFO.py``:
``clean_ufo`` (:48), ``get_tumor_segment_labels`` (:647),
``estimate_tumor_volume`` (:1335) and the segment→label-name mapping (:773).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

MAX_TUMORS = 10
LATERAL_ORGANS = {"kidney", "adrenal_gland", "lung", "breast", "femur"}

PANCREAS_SEGMENTS = ["head", "body", "tail"]
LIVER_SEGMENTS = [f"segment {i}" for i in range(1, 9)]
KIDNEY_SEGMENTS = ["left", "right"]


def is_healthy(col: pd.Series) -> pd.Series:
    """True where the 'no lesion' flag marks a healthy case (robust to the
    numeric/boolean/text encodings seen in real metadata files)."""
    if pd.api.types.is_bool_dtype(col):
        return col
    num = pd.to_numeric(col, errors="coerce")
    out = pd.Series(False, index=col.index)
    out[num.notna()] = num[num.notna()].eq(1)
    txt = col[num.isna()].astype(str).str.strip().str.lower()
    out.loc[num.isna() & txt.isin({"1", "1.0", "true", "t", "yes", "y"})] = True
    return out


def load_reports(path: str) -> pd.DataFrame:
    df = pd.read_csv(path)
    if "BDMAP ID" in df.columns:
        df = df.rename(columns={"BDMAP ID": "BDMAP_ID"})
    return df


def clean_reports(
    reports: pd.DataFrame,
    annotated_tumors: Sequence[str],
    limit_healthy: bool = True,
    seed: int = 42,
) -> Tuple[pd.DataFrame, List[str], Dict[str, List[str]]]:
    """Filter usable report cases (reference ``clean_ufo`` semantics):

    * drop LLM hallucinations ("0.0 x ..." sizes);
    * keep tumors only in `annotated_tumors` organs (or healthy cases);
    * drop cases with any non-numeric / unknown tumor size;
    * for paired organs, require left/right laterality;
    * optionally cap healthy cases at the largest per-organ tumor count.

    Returns (filtered rows, usable case ids, per-organ id lists).
    """
    size_str = reports["Tumor Size (mm)"].astype(str)
    halluc = reports[
        size_str.str.contains(r"^0\.0\s*x", regex=True, na=False)
        | size_str.isin(["0.0", "0"])
    ]["BDMAP_ID"]
    reports = reports[~reports["BDMAP_ID"].isin(set(halluc))]

    healthy = is_healthy(reports["no lesion"])
    reports = reports[reports["Standardized Organ"].isin(annotated_tumors) | healthy]
    healthy = is_healthy(reports["no lesion"])

    tumor_rows = ~healthy
    size_str = reports["Tumor Size (mm)"].astype(str)
    has_digit = size_str.str.contains(r"\d", regex=True, na=False)
    unk = reports["Unknow Tumor Size"].astype(str).str.strip().str.lower().ne("no")
    bad_ids = set(reports.loc[tumor_rows & (~has_digit | unk), "BDMAP_ID"])

    need_lr = tumor_rows & reports["Standardized Organ"].isin(LATERAL_ORGANS)
    loc = reports["Standardized Location"].astype(str).str.lower()
    has_lr = loc.str.contains("left", na=False) | loc.str.contains("right", na=False)
    bad_ids |= set(reports.loc[need_lr & ~has_lr, "BDMAP_ID"])
    reports = reports[~reports["BDMAP_ID"].isin(bad_ids)]

    healthy = is_healthy(reports["no lesion"])
    per_organ: Dict[str, List[str]] = {}
    keep = []
    for organ in annotated_tumors:
        sel = reports[
            (reports["Standardized Organ"] == organ)
            & (~reports["Tumor Size (mm)"].astype(str).isin(["u", "U", "multiple"]))
            & (reports["Unknow Tumor Size"].astype(str).str.lower() == "no")
        ]
        if organ in LATERAL_ORGANS:
            l = sel["Standardized Location"].astype(str).str.lower()
            sel = sel[l.str.contains("left") | l.str.contains("right")]
        per_organ[organ] = sorted(sel["BDMAP_ID"].unique())
        keep.append(sel)

    healthy_df = reports[healthy]
    if limit_healthy and per_organ:
        cap = max((len(v) for v in per_organ.values()), default=0)
        h_ids = sorted(healthy_df["BDMAP_ID"].unique())
        if len(h_ids) > cap and cap > 0:
            rng = np.random.default_rng(seed)
            h_ids = sorted(rng.choice(h_ids, size=cap, replace=False))
        healthy_df = healthy_df[healthy_df["BDMAP_ID"].isin(h_ids)]
    per_organ["healthy"] = sorted(healthy_df["BDMAP_ID"].unique())

    usable = pd.concat(keep + [healthy_df]).drop_duplicates()
    ids = sorted(usable["BDMAP_ID"].unique())
    return reports[reports["BDMAP_ID"].isin(ids)], ids, per_organ


def _split_location(loc) -> Optional[List[str]]:
    if not isinstance(loc, str) or loc.lower() == "u" or loc == "":
        return None
    return loc.split(" / ")


def segment_to_label(seg: str) -> str:
    """Report sub-segment term → label-map class name
    (reference ``dataset_abdomenatlas_UFO.py:773``)."""
    return (
        seg.replace("segment ", "liver_segment_")
        .replace("head", "pancreas_head")
        .replace("body", "pancreas_body")
        .replace("tail", "pancreas_tail")
        .replace("left", "kidney_left")
        .replace("right", "kidney_right")
    )


def expand_segment_group(group: Sequence[str]) -> List[str]:
    """Whole-organ terms expand to all their sub-segments
    (``get_random_tumor_seg_mask`` :763-770)."""
    if list(group) == ["pancreas"]:
        return PANCREAS_SEGMENTS[:]
    if list(group) == ["liver"]:
        return LIVER_SEGMENTS[:]
    if list(group) == ["kidney"]:
        return KIDNEY_SEGMENTS[:]
    return list(group)


def lesion_class_for_segments(segments: Sequence[str], class_name: str) -> bool:
    """Does lesion channel `class_name` correspond to a crop on `segments`?
    (``get_chosen_segment_mask`` routing, :816-831.)"""
    joined = " ".join(segments)
    if ("segment" in joined or "liver" in joined) and "liver_lesion" in class_name:
        return True
    if (
        any(t in joined for t in ("head", "body", "tail", "pancreas"))
        and "pancreatic_lesion" in class_name
    ):
        return True
    if (
        any(t in joined for t in ("left", "right", "kidney"))
        and "kidney_lesion" in class_name
    ):
        return True
    return False


def case_supervision(case_rows: pd.DataFrame) -> Dict:
    """Per-case tumor-location analysis (reference ``get_tumor_segment_labels``).

    Returns a dict with:
      * ``segment_groups``: list of segment-term groups (tumors spanning
        several sub-segments stay grouped) whose tumors all have known sizes;
      * ``organs_known``: organs where every tumor has known size + location;
      * ``tumor_organs`` / ``tumor_segments_flat``: everything mentioned;
      * ``has_tumor``: bool.
    """
    if case_rows is None or len(case_rows) == 0 or is_healthy(case_rows["no lesion"]).all():
        return {
            "segment_groups": [],
            "organs_known": [],
            "tumor_organs": [],
            "tumor_segments_flat": [],
            "has_tumor": False,
        }

    locs = case_rows["Standardized Location"].tolist()
    sizes = case_rows["Tumor Size (mm)"].tolist()
    organs = case_rows["Standardized Organ"].tolist()

    organs_unk_seg, organs_unk_size, segs_unk_size = set(), set(), set()
    for loc, size, organ in zip(locs, sizes, organs):
        size_unknown = pd.isna(size) or str(size).lower() in ("u", "multiple")
        group = _split_location(loc)
        if size_unknown:
            if isinstance(organ, str):
                organs_unk_size.add(organ)
            if group:
                segs_unk_size.update(group)
        if group is None:
            if isinstance(organ, str):
                organs_unk_seg.add(organ)

    # segments inside organs that have any unknown tumor
    segs_in_unk_organs = set()
    for loc, organ in zip(locs, organs):
        group = _split_location(loc)
        if group and organ in (organs_unk_seg | organs_unk_size):
            segs_in_unk_organs.update(group)

    groups = []
    for loc in locs:
        g = _split_location(loc)
        if g and g not in groups:
            groups.append(g)
    flat = sorted({s for g in groups for s in g})

    tumor_organs = sorted(
        {o for o in organs if isinstance(o, str) and o.lower() != "u"}
    )
    organs_known = sorted(
        set(tumor_organs) - organs_unk_seg - organs_unk_size
    )

    # keep only fully-known segment groups (merging groups sharing a segment)
    known_groups = []
    banned = segs_unk_size | segs_in_unk_organs
    for seg in sorted(set(flat) - banned):
        related = sorted({s for g in groups if seg in g for s in g})
        if any(s in banned for s in related):
            continue
        if related not in known_groups:
            known_groups.append(related)

    return {
        "segment_groups": known_groups,
        "organs_known": organs_known,
        "tumor_organs": tumor_organs,
        "tumor_segments_flat": flat,
        "has_tumor": True,
    }


def parse_size_mm(size) -> Optional[Tuple[float, List[float]]]:
    """'d' or 'a x b x c' (mm) → (volume mm³, [d1, d2, d3]).

    Sphere for single diameters, ellipsoid for multi; a missing third axis is
    the mean of the other two (reference ``estimate_tumor_volume`` :1391-1407).
    """
    s = str(size)
    if "x" not in s:
        try:
            d = float(s)
        except ValueError:
            return None
        return (4.0 / 3.0) * math.pi * (d / 2.0) ** 3, [d, d, d]
    parts = [p.strip() for p in s.split("x")]
    try:
        dims = [float(p) for p in parts]
    except ValueError:
        return None
    if len(dims) == 2:
        dims.append(sum(dims) / 2.0)
    dims = dims[:3]
    vol = (4.0 / 3.0) * math.pi * (dims[0] / 2) * (dims[1] / 2) * (dims[2] / 2)
    return vol, dims


def estimate_tumor_volumes(
    case_rows: pd.DataFrame, crop_segments: Optional[Sequence[str]]
) -> Tuple[np.ndarray, np.ndarray]:
    """Volumes (T,) and diameters (T, 3) of the report tumors fully inside the
    cropped segment group; zero-padded to MAX_TUMORS.

    `crop_segments`: the segment-term group the crop targeted (or organ names),
    or None/'random' → all zeros (reference ``estimate_tumor_volume``).
    """
    vols = np.zeros((MAX_TUMORS,), np.float32)
    dias = np.zeros((MAX_TUMORS, 3), np.float32)
    if crop_segments is None or crop_segments == "random" or case_rows is None:
        return vols, dias
    if isinstance(crop_segments, str):
        crop_segments = [crop_segments]
    joined = "".join(crop_segments)
    if any(o in joined for o in ("liver", "kidney", "pancreas")):
        col = "Standardized Organ"
    else:
        col = "Standardized Location"

    i = 0
    for _, row in case_rows.iterrows():
        loc = row[col]
        group = _split_location(loc)
        if group is None:
            continue
        if not all(g in crop_segments for g in group):
            continue
        parsed = parse_size_mm(row["Tumor Size (mm)"])
        if parsed is None:
            continue
        if i >= MAX_TUMORS:
            break
        vols[i], dias[i] = parsed[0], parsed[1]
        i += 1
    return vols, dias
