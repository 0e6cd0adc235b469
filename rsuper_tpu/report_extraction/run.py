"""Resumable report-extraction driver.

Equivalent of the reference's ``RunRadGPT.py`` + ``RadGPT.inference_loop``
(:1899) + ``postprocess.py`` + ``create_metadata.py``: read a reports CSV,
shard across parts, query the LLM per report (skipping ids already answered),
append raw answers, then standardise into the per-tumor + per-CT CSVs.

Usage:
    python -m rsuper_tpu.report_extraction.run \\
        --reports reports.csv --out_dir extraction/ \\
        --base_url http://localhost:8000/v1 --parts 4 --part 0
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict

import pandas as pd

from .client import LLMClient
from .metadata import build_per_ct_csv, build_per_tumor_csv
from . import parse as P
from . import prompts as PR
from .parse import (
    parse_lesion_answer,
    parse_malignancy,
    parse_malignant_size,
    parse_single_organ_lesions,
    parse_tumor_detection,
)
from .prompts import ORGAN_LOCATIONS

# extraction steps mirrored from the reference's RadGPT prompt library
# (``get_instuctions`` / ``interpret_output``): 'type and size multi-organ'
# is the R-Super training step; the rest are the screening / per-organ /
# research workflow steps (full RadGPT step parity — see docs/parity.md)
STEPS = {
    "type_and_size": (PR.LESION_EXTRACTION_SYSTEM, PR.LESION_EXTRACTION_USER),
    "tumor_detection": (PR.TUMOR_DETECTION_SYSTEM, PR.TUMOR_DETECTION_USER),
    "malignancy": (PR.MALIGNANCY_SYSTEM, PR.MALIGNANCY_USER),
    "type_and_size_organ": (PR.TYPE_SIZE_ORGAN_SYSTEM,
                            PR.TYPE_SIZE_ORGAN_USER),
    "type_and_size_pathology": (PR.TYPE_SIZE_PATHOLOGY_SYSTEM,
                                PR.TYPE_SIZE_PATHOLOGY_USER),
    "malignant_size": (PR.MALIGNANT_SIZE_SYSTEM, PR.MALIGNANT_SIZE_USER),
    "hcc": (PR.HCC_SYSTEM, PR.HCC_USER),
    "diagnoses": (PR.DIAGNOSES_SYSTEM, PR.DIAGNOSES_USER),
    "synonyms": (PR.SYNONYMS_SYSTEM, PR.SYNONYMS_USER),
    "longitudinal_pancreas": (PR.LONGITUDINAL_SYSTEM, PR.LONGITUDINAL_USER),
    "longitudinal_pancreas_diagnosis": (PR.LONGITUDINAL_DIAG_SYSTEM,
                                        PR.LONGITUDINAL_DIAG_USER),
    "refine_normal_pancreas": (PR.REFINE_NORMAL_SYSTEM,
                               PR.REFINE_NORMAL_USER),
    "matching_reports": (PR.MATCHING_REPORTS_SYSTEM,
                         PR.MATCHING_REPORTS_USER),
    "time_machine": (PR.TIME_MACHINE_SYSTEM, PR.TIME_MACHINE_USER),
}


def read_reports(path: str, report_column: str | None = None) -> pd.DataFrame:
    """Load a reports table in any of the reference's input formats —
    csv / xlsx / feather (``RunRadGPT.py:101-146``: xlsx tries sheet 1 and
    falls back to the default sheet; rows with a missing report text are
    dropped)."""
    lower = path.lower()
    if lower.endswith((".xlsx", ".xls")):
        try:
            df = pd.read_excel(path, sheet_name=1)
        except Exception:
            df = pd.read_excel(path)
    elif lower.endswith(".feather"):
        df = pd.read_feather(path)
    else:
        df = pd.read_csv(path)
    if report_column and report_column in df.columns:
        df = df.dropna(subset=[report_column])
    return df


_DETECTION_LABEL_COLS = ("Liver Tumor", "Kidney Tumor", "Pancreas Tumor")


def example_records(df: pd.DataFrame, example_ids, id_column: str,
                    report_column: str, label_column: str | None = None):
    """(report, label) pairs for the few-shot example ids (reference
    ``get_report_n_label`` RadGPT.py:967-1005: the label is either an
    explicit column or the detection-flag triple 'liver tumor=N; kidney
    tumor=N; pancreas tumor=N'). Missing report or label raises, as the
    reference does (:1163-1164)."""
    recs = []
    for ex in example_ids:
        sel = df[df[id_column].astype(str) == str(ex)]
        if sel.empty:
            raise ValueError(f"example id {ex!r} not found in {id_column}")
        row = sel.iloc[0]
        report = row[report_column]
        if not isinstance(report, str):
            raise ValueError(f"no report text for example {ex!r}")
        if label_column:
            label = row[label_column]
            if pd.isna(label):
                raise ValueError(f"no {label_column!r} label for {ex!r}")
            label = str(label)
        else:
            try:
                label = "; ".join(
                    f"{c.split()[0].lower()} tumor={int(row[c])}"
                    for c in _DETECTION_LABEL_COLS)
            except (KeyError, TypeError, ValueError):
                raise ValueError(
                    f"no label available for example {ex!r}: need "
                    f"{list(_DETECTION_LABEL_COLS)} columns or "
                    "--label_column")
        recs.append((report, label))
    return recs


def pair_time_machine_reports(
    df: pd.DataFrame,
    id_column: str = "BDMAP_ID",
    report_column: str = "Report Text",
    timeline_column: str = "pancreatic cancer timeline",
    patient_column: str = "Assigned Number",
    date_column: str = "Exam Started Date",
) -> pd.DataFrame:
    """The 'time machine' pairing (reference RadGPT.py:2188-2205 +
    ``get_first_malignancy`` :1766-1803): keep exams whose timeline marks a
    'pre-diagnosis' report, pair each with the same patient's
    chronologically-first 'first positive' report, and compose the
    two-report payload the prompt consumes. Rows without a matched
    first-malignancy report are dropped (the reference raises; skipping
    keeps a sharded run alive). The timeline column default is the
    reference's pancreas-specific study column — pass ``timeline_column``
    for other cohorts. One sort+groupby finds every patient's first
    positive (the reference rescans the frame per row)."""
    firsts = (
        df[df[timeline_column] == "first positive"]
        .sort_values(date_column)
        .groupby(patient_column, sort=False)
        .head(1)
        .set_index(patient_column)
    )
    rows = []
    for _, r in df.iterrows():
        timeline = r.get(timeline_column)
        if not isinstance(timeline, str) or "pre-diagnosis" not in timeline:
            continue
        try:
            diag = firsts.loc[r[patient_column]]
        except KeyError:
            continue
        rows.append({
            id_column: r[id_column],
            report_column: PR.build_time_machine_payload(
                str(r[report_column]), r.get(date_column),
                str(diag[report_column]), diag[date_column],
            ),
        })
    return pd.DataFrame(rows, columns=[id_column, report_column])


def run_extraction(
    reports_csv: str,
    out_dir: str,
    client: LLMClient,
    id_column: str = "BDMAP_ID",
    report_column: str = "Report Text",
    parts: int = 1,
    part: int = 0,
    batch: int = 8,
    step: str = "type_and_size",
    organ: str = "liver",
    timeline_column: str = "pancreatic cancer timeline",
    examples=(),
    label_column: str | None = None,
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    raw_path = os.path.join(out_dir, f"raw_answers_part{part}.jsonl")
    system, user = STEPS[step]
    system = system.replace("{organ}", organ).replace(
        "{organ_locations}", ORGAN_LOCATIONS.get(organ, "left, right")
    )

    df = read_reports(reports_csv, report_column)
    if "BDMAP ID" in df.columns:
        df = df.rename(columns={"BDMAP ID": id_column})
    prefix = ""
    if examples:
        prefix = PR.build_examples_block(example_records(
            df, examples, id_column, report_column, label_column))
    if step == "time_machine":
        # pair BEFORE part-sharding so every part sees whole patients
        df = pair_time_machine_reports(df, id_column, report_column,
                                       timeline_column=timeline_column)
    df = df.iloc[part::parts]

    done = set()
    if os.path.exists(raw_path):
        with open(raw_path) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["id"])
                except Exception:
                    pass

    todo = df[~df[id_column].isin(done)]
    ids = todo[id_column].tolist()
    texts = todo[report_column].astype(str).tolist()
    for i in range(0, len(ids), batch):
        chunk_ids = ids[i : i + batch]
        prompts = [prefix + user.format(report=t)
                   for t in texts[i : i + batch]]
        answers = client.chat_batch(system, prompts)
        with open(raw_path, "a") as f:
            for cid, ans in zip(chunk_ids, answers):
                if ans is not None:
                    f.write(json.dumps({"id": cid, "answer": ans}) + "\n")


def _collect_answers(out_dir: str) -> Dict[str, str]:
    """Last answer per id across all parts (reference ``postprocess.py:7``)."""
    answers: Dict[str, str] = {}
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("raw_answers"):
            continue
        with open(os.path.join(out_dir, name)) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                    answers[rec["id"]] = rec["answer"]
                except Exception:
                    continue
    return answers


def postprocess_answers(out_dir: str, step: str = "type_and_size",
                        organ: str = "liver") -> None:
    """Raw answers (all parts) → CSVs. `type_and_size` emits the per-tumor +
    per-CT training/eval CSVs; the screening steps emit one flags CSV."""
    answers = _collect_answers(out_dir)
    if step == "tumor_detection":
        rows = [{"BDMAP_ID": cid, **parse_tumor_detection(ans)}
                for cid, ans in answers.items()]
        pd.DataFrame(rows).to_csv(
            os.path.join(out_dir, "tumor_detection.csv"), index=False)
        return
    if step == "malignancy":
        rows = [{"BDMAP_ID": cid, **parse_malignancy(ans, organ)}
                for cid, ans in answers.items()]
        pd.DataFrame(rows).to_csv(
            os.path.join(out_dir, f"malignancy_{organ}.csv"), index=False)
        return
    if step == "malignant_size":
        rows = [{"BDMAP_ID": cid, **parse_malignant_size(ans, organ)}
                for cid, ans in answers.items()]
        pd.DataFrame(rows).to_csv(
            os.path.join(out_dir, f"malignant_size_{organ}.csv"), index=False)
        return
    if step in ("type_and_size_organ", "type_and_size_pathology"):
        rows = []
        for cid, ans in answers.items():
            for i, t in enumerate(parse_single_organ_lesions(ans, organ)):
                rows.append({"BDMAP_ID": cid, "tumor": i + 1, **t})
        suffix = ("pathology_" if step == "type_and_size_pathology" else "")
        pd.DataFrame(rows).to_csv(
            os.path.join(out_dir, f"type_and_size_{suffix}{organ}.csv"),
            index=False)
        return
    if step == "hcc":
        rows = []
        for cid, ans in answers.items():
            for key, rec in P.parse_hcc(ans).items():
                rows.append({"BDMAP_ID": cid, "tumor": key, **rec})
        pd.DataFrame(rows).to_csv(os.path.join(out_dir, "hcc_liver.csv"),
                                  index=False)
        return
    if step == "diagnoses":
        rows = [{"BDMAP_ID": cid,
                 "abnormalities": "; ".join(P.parse_diagnoses(ans) or [])}
                for cid, ans in answers.items()]
        pd.DataFrame(rows).to_csv(os.path.join(out_dir, "diagnoses.csv"),
                                  index=False)
        return
    if step == "synonyms":
        rows = []
        for cid, ans in answers.items():
            syn = P.parse_synonyms(ans) or {}
            for term, alts in syn.items():
                rows.append({"BDMAP_ID": cid, "term": term,
                             "synonyms": "; ".join(map(str, alts))})
        pd.DataFrame(rows).to_csv(os.path.join(out_dir, "synonyms.csv"),
                                  index=False)
        return
    if step == "longitudinal_pancreas":
        rows = [{"BDMAP_ID": cid, **P.parse_longitudinal(ans)}
                for cid, ans in answers.items()]
        pd.DataFrame(rows).to_csv(
            os.path.join(out_dir, "longitudinal_pancreas.csv"), index=False)
        return
    if step == "longitudinal_pancreas_diagnosis":
        rows = [{"BDMAP_ID": cid,
                 **(P.parse_longitudinal_diagnosis(ans)
                    or {"Tumor Types": None})}
                for cid, ans in answers.items()]
        pd.DataFrame(rows).to_csv(
            os.path.join(out_dir, "longitudinal_pancreas_diagnosis.csv"),
            index=False)
        return
    if step == "refine_normal_pancreas":
        rows = [{"BDMAP_ID": cid, **P.parse_refine_normal_pancreas(ans)}
                for cid, ans in answers.items()]
        pd.DataFrame(rows).to_csv(
            os.path.join(out_dir, "refine_normal_pancreas.csv"), index=False)
        return
    if step == "matching_reports":
        rows = [{"BDMAP_ID": cid, **P.parse_matching_reports(ans)}
                for cid, ans in answers.items()]
        pd.DataFrame(rows).to_csv(
            os.path.join(out_dir, "matching_reports.csv"), index=False)
        return
    if step == "time_machine":
        rows = [{"BDMAP_ID": cid, **P.parse_time_machine(ans, organ)}
                for cid, ans in answers.items()]
        pd.DataFrame(rows).to_csv(
            os.path.join(out_dir, f"time_machine_{organ}.csv"), index=False)
        return
    parsed = {cid: parse_lesion_answer(ans) for cid, ans in answers.items()}
    per_tumor = build_per_tumor_csv(parsed)
    per_tumor.to_csv(os.path.join(out_dir, "per_tumor.csv"), index=False)
    per_ct = build_per_ct_csv(per_tumor)
    per_ct.to_csv(os.path.join(out_dir, "per_ct.csv"), index=False)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--reports", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--base_url", default="http://localhost:8000/v1")
    p.add_argument("--model", default="meta-llama/Llama-3.1-70B-Instruct-AWQ")
    p.add_argument("--report_column", default="Report Text")
    p.add_argument("--parts", type=int, default=1)
    p.add_argument("--part", type=int, default=0)
    p.add_argument("--step", default="type_and_size", choices=sorted(STEPS))
    p.add_argument("--organ", default="liver",
                   help="target organ for the malignancy step")
    p.add_argument("--timeline_column", default="pancreatic cancer timeline",
                   help="cohort timeline column for the time_machine step")
    p.add_argument("--examples", default="",
                   help="comma-separated ids of labeled reports to inject "
                        "as few-shot examples (reference "
                        "create_conversation examples loop)")
    p.add_argument("--label_column", default=None,
                   help="label column for --examples (default: the "
                        "detection-flag triple)")
    p.add_argument("--postprocess_only", action="store_true")
    args = p.parse_args(argv)
    if not args.postprocess_only:
        client = LLMClient(base_url=args.base_url, model=args.model)
        run_extraction(args.reports, args.out_dir, client,
                       report_column=args.report_column,
                       parts=args.parts, part=args.part,
                       step=args.step, organ=args.organ,
                       timeline_column=args.timeline_column,
                       examples=[e for e in args.examples.split(",") if e],
                       label_column=args.label_column)
    postprocess_answers(args.out_dir, step=args.step, organ=args.organ)


if __name__ == "__main__":
    main()
