"""Metadata standardisation: raw parsed lesions → training/eval CSVs.

Equivalent of the reference's ``report_extraction/create_metadata.py``:
* organ-name standardisation (:760) and location mapping — liver segments
  (:892), pancreas head/body/tail (:966), left/right (:1036);
* lesion-vs-cyst classification via synonym tables (:346 ``classify_two``);
* the **per-tumor CSV** consumed by training (columns ``BDMAP_ID``,
  ``Standardized Organ``, ``Standardized Location``, ``Tumor Size (mm)``,
  ``Unknow Tumor Size``, ``no lesion``) and the **per-CT CSV** used as eval
  ground truth (``number of {organ} lesion instances``).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence

import pandas as pd

ORGAN_SYNONYMS = {
    "liver": ["liver", "hepatic", "hepatis"],
    "pancreas": ["pancreas", "pancreatic", "pancreatitis head", "uncinate"],
    "kidney": ["kidney", "renal", "kidneys"],
    "spleen": ["spleen", "splenic"],
    "adrenal_gland": ["adrenal"],
    "lung": ["lung", "pulmonary"],
    "gallbladder": ["gallbladder", "gall bladder"],
    "bladder": ["bladder", "urinary bladder"],
    "breast": ["breast"],
    "bone": ["bone", "osseous", "vertebra", "rib", "pelvis bone", "femur"],
    "colon": ["colon", "colonic", "sigmoid", "cecum"],
    "stomach": ["stomach", "gastric"],
    "esophagus": ["esophagus", "esophageal"],
    "uterus": ["uterus", "uterine"],
    "prostate": ["prostate", "prostatic"],
    "duodenum": ["duodenum", "duodenal"],
}

CYST_TERMS = ["cyst", "ipmn", "pseudocyst", "cystic"]
BENIGN_TERMS = ["hemangioma", "angiomyolipoma", "adenoma", "lipoma", "fnh",
                "focal nodular hyperplasia", "oncocytoma"]


def standardize_organ(raw: str) -> Optional[str]:
    if not isinstance(raw, str):
        return None
    low = raw.strip().lower()
    if low in ("u", "", "no lesion"):
        return None
    for organ, syns in ORGAN_SYNONYMS.items():
        if any(s in low for s in syns):
            return organ
    return None


def standardize_location(raw: str, organ: Optional[str]) -> str:
    """Map a free-text location to the segment vocabulary used downstream:
    'head'/'body'/'tail', 'segment N' (multi as 'segment A / segment B'),
    'left'/'right', else 'u'."""
    if not isinstance(raw, str) or organ is None:
        return "u"
    low = raw.strip().lower()
    if low in ("u", ""):
        return "u"
    if organ == "pancreas":
        parts = [p for p in ("head", "body", "tail", "neck", "uncinate") if p in low]
        parts = ["head" if p in ("neck", "uncinate") else p for p in parts]
        parts = sorted(set(parts))
        return " / ".join(parts) if parts else "u"
    if organ == "liver":
        segs = sorted({int(n) for n in re.findall(r"segment\s*(?:i{1,3}v?|[1-8])?\s*([1-8])", low)}
                      | {int(n) for n in re.findall(r"\bseg(?:ment)?\s*([1-8])\b", low)})
        if not segs:
            segs = sorted({int(n) for n in re.findall(r"\b([1-8])\b", low)
                           if "segment" in low})
        if segs:
            return " / ".join(f"segment {s}" for s in segs)
        # lobes map to canonical segment groups
        if "right lobe" in low:
            return "u"
        return "u"
    if organ in ("kidney", "adrenal_gland", "lung", "breast", "femur"):
        l, r = "left" in low, "right" in low
        if l and r:
            return "u"
        if l:
            return "left"
        if r:
            return "right"
        return "u"
    return "u"


def classify_lesion(lesion_type: str) -> str:
    """'cyst' / 'benign' / 'lesion' (the reference separates cysts and counts
    everything else as a lesion for supervision; ``classify_two``)."""
    if not isinstance(lesion_type, str):
        return "lesion"
    low = lesion_type.lower()
    if any(t in low for t in CYST_TERMS):
        return "cyst"
    if any(t in low for t in BENIGN_TERMS):
        return "benign"
    return "lesion"


def build_per_tumor_csv(parsed: Dict[str, List[Dict[str, str]]]) -> pd.DataFrame:
    """{case_id: [lesion dicts from parse_lesion_answer]} → per-tumor rows."""
    rows = []
    for case_id, lesions in parsed.items():
        if not lesions:
            continue
        if lesions[0].get("no_lesion") == "1":
            rows.append({
                "BDMAP_ID": case_id, "Tumor ID": 0,
                "Standardized Organ": "", "Standardized Location": "",
                "Tumor Size (mm)": "", "Unknow Tumor Size": "",
                "Lesion Class": "", "no lesion": 1,
            })
            continue
        for i, les in enumerate(lesions, 1):
            organ = standardize_organ(les.get("organ", ""))
            loc = standardize_location(les.get("location", ""), organ)
            size = les.get("size", "u")
            unknown = "yes" if size in ("u", "multiple", "tiny") else "no"
            rows.append({
                "BDMAP_ID": case_id, "Tumor ID": i,
                "Standardized Organ": organ or "u",
                "Standardized Location": loc,
                "Tumor Size (mm)": size,
                "Unknow Tumor Size": unknown,
                "Lesion Class": classify_lesion(les.get("type", "")),
                "no lesion": 0,
            })
    df = pd.DataFrame(rows)
    if len(df):
        df = df.drop_duplicates(subset=["BDMAP_ID", "Tumor ID"], keep="last")
    return df


def build_per_ct_csv(
    per_tumor: pd.DataFrame,
    organs: Sequence[str] = ("liver", "pancreatic", "kidney"),
) -> pd.DataFrame:
    """Per-CT lesion-instance counts — the eval ground-truth table
    (reference ``create_metadata.py`` header :80)."""
    organ_key = {"pancreatic": "pancreas", "liver": "liver", "kidney": "kidney"}
    rows = []
    for case_id, grp in per_tumor.groupby("BDMAP_ID"):
        row = {"BDMAP_ID": case_id}
        healthy = bool((grp["no lesion"] == 1).all())
        for org in organs:
            src = organ_key.get(org, org)
            if healthy:
                row[f"number of {org} lesion instances"] = 0
                continue
            sel = grp[(grp["Standardized Organ"] == src)
                      & (grp["Lesion Class"] != "cyst")]
            row[f"number of {org} lesion instances"] = int(len(sel))
        rows.append(row)
    return pd.DataFrame(rows)
