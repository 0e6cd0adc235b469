#!/usr/bin/env python
"""Collect the TPU experiment batch results into one summary.

Scans ``artifacts/exp_*.log`` for the single JSON result line each bench
script prints, pairs it with the stage return codes recorded by
``tools/run_tpu_experiments.sh`` / ``round4_chain.sh`` in the chain log, and
prints a markdown table plus a machine-readable JSON blob stamped with the
commit the batch ran at.

Usage:
    python tools/collect_results.py              # markdown to stdout
    python tools/collect_results.py --json       # JSON only
    python tools/collect_results.py --write      # also docs/results_<sha>.json

The perf-doc rule from VERDICT r3 #4: every headline number must carry the
commit it was measured at. This tool is how those numbers get captured.
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
ART = REPO / "artifacts"

# stage name -> the metric keys worth surfacing in the markdown table
STAGES = [
    "probe", "calibcheck", "smoke", "bench96", "bench128", "augment",
    "augment_fullwarp", "loop_device", "loop_host", "loop_off", "infer",
    "profile96", "profile_infer",
    # round-4c augment A/B (tools/round4c_chain.sh)
    "augment_r4c", "augment_shear", "loop_shear",
    # round-5a chain (tools/round5a_chain.sh)
    "smoke_r5a", "bench96_r5a", "bench128_r5a", "augment_r5a",
    "augment_shear_r5a",
    # round-5b chain (tools/round5b_chain.sh)
    "smoke_r5b", "augment_r5b", "bench96_r5b", "bench128_r5b",
    "loop_r5b", "loop_inline_r5b", "infer_r5b", "profile96_r5b",
    "calib_fg", "smoke_fg", "bench96_fg", "bench128_fg",
    "bench96_dilate_iter", "phantom_d",
    # round-5d chain (tools/round5d_chain.sh — the 5c plan on the fresh
    # checkout; the previous session's artifacts were lost)
    "smoke_r5d", "calib_efg", "smoke_efg", "bench96_r5d", "bench128_r5d",
    "infer_r5d", "infer_b8_r5d", "loop_inline_r5d", "profile96_r5d",
    "phantom_d_wrap",
    # round-5e chain (tools/round5e_chain.sh — headlines first; stages also
    # append to the tracked docs/results_r5e.md as they complete)
    "smoke_r5e", "bench96_r5e", "bench128_r5e", "infer_b4_r5e",
    "infer_b8_r5e", "loop_inline_r5e", "calib_e128_r5e", "smoke_e128_r5e",
    "bench128_e_r5e", "profile96_r5e", "phantom_d_r5e",
]


def head_sha() -> str:
    try:
        return subprocess.run(
            ["git", "-C", str(REPO), "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:
        return "unknown"


def last_json_line(path: Path):
    """The result line is the LAST parseable JSON object line in the log."""
    if not path.exists():
        return None
    result = None
    for line in path.read_text(errors="replace").splitlines():
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                result = json.loads(line)
            except ValueError:
                continue
    return result


def stage_rcs(chain_logs) -> dict:
    rcs = {}
    for log in chain_logs:
        if not log.exists():
            continue
        for m in re.finditer(r"^--- (\w+) rc=(\d+)", log.read_text(errors="replace"), re.M):
            rcs[m.group(1)] = int(m.group(2))
    return rcs


def collect() -> dict:
    rcs = stage_rcs([ART / "chain.log", ART / "batch.log"])
    out = {"commit": head_sha(), "stages": {}}
    for name in STAGES:
        log = ART / f"exp_{name}.log"
        entry = {"rc": rcs.get(name), "result": last_json_line(log)}
        if log.exists():
            entry["mtime"] = log.stat().st_mtime
        out["stages"][name] = entry
    return out


def fmt_result(res) -> str:
    if res is None:
        return "—"
    if "metric" in res:
        vs = res.get("vs_baseline")
        s = f"{res['value']:.4g} {res.get('unit', '')}".strip()
        return f"{s} ({vs:.2f}× baseline)" if vs is not None else s
    # generic: show up to 4 scalar fields
    parts = [f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
             for k, v in list(res.items())[:4]]
    return ", ".join(parts)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--write", action="store_true",
                    help="also write docs/results_<sha>.json")
    args = ap.parse_args()

    data = collect()
    if args.json:
        print(json.dumps(data, indent=2))
    else:
        print(f"# TPU batch results @ {data['commit']}\n")
        print("| stage | rc | result |")
        print("|---|---|---|")
        for name, entry in data["stages"].items():
            rc = entry["rc"]
            rc_s = "—" if rc is None else ("ok" if rc == 0 else f"FAIL({rc})")
            print(f"| {name} | {rc_s} | {fmt_result(entry['result'])} |")
    if args.write:
        dest = REPO / "docs" / f"results_{data['commit']}.json"
        dest.write_text(json.dumps(data, indent=2) + "\n")
        print(f"\nwrote {dest}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
