#!/usr/bin/env python
"""Seed artifacts/vmem_calib2.jsonl from the committed ops/vmem_table.py.

The calibration jsonl lives in gitignored artifacts/ and dies with the
checkout, but tools/calibrate_vmem.py resumes by skipping cells present in
the jsonl. After a fresh checkout, re-measuring every already-known cell
costs hours of remote compiles — this tool synthesizes the WHOLE-PLANE
records the committed table already encodes (cap per formulation = one ok
record at the cap TD plus fail records above it; cap 0 = fails at every
candidate TD), so a follow-up sweep measures only genuinely new cells
(e.g. the e/f/g forms at the 128³ signatures).

Only valid while the conv kernels are unchanged since the table was
measured — a kernel change must re-measure from scratch (delete the jsonl).
Synthesized records carry "synth": true and no timing; the merge-aware
emit keeps the table's existing PREFERRED_FORM rows for them.

H-tiled / dwconv replay cells are NOT synthesized (their cell keys embed
trace-time td/th picks); with the merge-aware emit a re-measure of those is
optional, not required.
"""

import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
CALIB = REPO / "artifacts" / "vmem_calib2.jsonl"


def main():
    import sys

    sys.path.insert(0, str(REPO))
    from rsuper_tpu.ops.vmem_table import MEASURED_TD

    done = set()
    if CALIB.exists():
        for line in CALIB.read_text().splitlines():
            if line.strip():
                done.add(tuple(json.loads(line)["cell"]))

    CALIB.parent.mkdir(parents=True, exist_ok=True)
    n = 0
    with CALIB.open("a") as f:
        for (form, kind, S, Ci, Co, itemsize, fused), cap in sorted(
                MEASURED_TD.items()):
            key = (kind, S, Ci, Co, itemsize, bool(fused))
            for td in (8, 4, 2, 1):
                cell = ("plane", form) + key + (td,)
                ok = td == cap
                if td < cap:
                    break  # the sweep stops at the first (largest) success
                if cell in done:
                    if ok:
                        break
                    continue
                f.write(json.dumps({
                    "cell": list(cell), "ok": ok, "scoped_bytes": None,
                    "ms": None, "seconds": 0.0, "synth": True,
                    "error": None if ok else "synth: above measured cap",
                }) + "\n")
                n += 1
                if ok:
                    break
    print(f"seeded {n} synthetic plane cells into {CALIB}")


if __name__ == "__main__":
    main()
