#!/usr/bin/env python
"""Aggregate phantom-study per-seed results (partial runs included).

`tools/phantom_benchmark.py --seeds N` persists each completed seed to
`<out>/seed<k>/result.json` and resumes from them, so a study interrupted by
the TPU window closing (or the round ending) keeps every finished seed.
This tool aggregates whatever seeds exist RIGHT NOW with the same paired
statistics and the same pre-registered both-arms-degenerate exclusion the
full run would apply, so a partial study D is reportable at any moment.

    python tools/summarize_phantom.py artifacts/phantom_d \
        [--exclude_degenerate 0.05]

Prints one JSON line (machine) plus a markdown table (docs).
"""

import argparse
import glob
import json
import math
import os
import re
import sys

import numpy as np

KEYS = ("lesion_dice", "lesion_nsd", "f1", "sensitivity")


def load_seeds(out_dir):
    rows = []
    for p in sorted(glob.glob(os.path.join(out_dir, "seed*", "result.json"))):
        m = re.search(r"seed(\d+)", os.path.dirname(p))
        with open(p) as f:
            rec = json.load(f)
        rec["_seed"] = int(m.group(1)) if m else -1
        rows.append(rec)
    return rows


def aggregate(rows):
    def agg(arm, key):
        vals = np.array([r[arm][key] for r in rows], np.float64)
        return {"mean": float(vals.mean()), "std": float(vals.std())}

    gains = {
        k: np.array([r["report"][k] - r["mask_only"][k] for r in rows])
        for k in KEYS
    }
    return {
        "mask_only": {k: agg("mask_only", k) for k in KEYS},
        "report": {k: agg("report", k) for k in KEYS},
        "paired_gain": {
            k: {
                "mean": float(g.mean()),
                "std": float(g.std()),
                "sem": float(g.std() / max(1, math.sqrt(len(g)))),
                "positive_seeds": int((g > 0).sum()),
                "values": [round(float(v), 4) for v in g],
            }
            for k, g in gains.items()
        },
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--exclude_degenerate", type=float, default=0.05)
    args = ap.parse_args(argv)

    rows = load_seeds(args.out_dir)
    if not rows:
        print(f"no seed*/result.json under {args.out_dir}", file=sys.stderr)
        return 1

    kept = [
        r for r in rows
        if not (r["mask_only"]["lesion_dice"] < args.exclude_degenerate
                and r["report"]["lesion_dice"] < args.exclude_degenerate)
    ]
    excluded = [r["_seed"] for r in rows if r not in kept]

    summary = {
        "metric": "phantom_report_vs_mask_only_partial",
        "seeds_found": len(rows),
        "seeds_kept": len(kept),
        "excluded_seeds": excluded,
        **aggregate(kept if kept else rows),
    }
    if rows != kept:
        summary["raw_all_seeds"] = aggregate(rows)
    print(json.dumps(summary))

    n = len(kept)
    print(f"\n| metric | mask-only (mean±std) | +report (mean±std) "
          f"| paired gain (mean ± sem, n={n}) |")
    print("|---|---|---|---|")
    for k in KEYS:
        m, r_, g = (summary["mask_only"][k], summary["report"][k],
                    summary["paired_gain"][k])
        print(f"| {k} | {m['mean']:.3f} ± {m['std']:.3f} "
              f"| {r_['mean']:.3f} ± {r_['std']:.3f} "
              f"| {g['mean']:+.3f} ± {g['sem']:.3f} "
              f"({g['positive_seeds']}/{n} seeds positive) |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
