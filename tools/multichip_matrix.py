#!/usr/bin/env python
"""Scale the multi-chip dryrun evidence: run `dryrun_multichip(n)` for a
matrix of virtual device counts (fresh subprocess each — XLA device count is
fixed at backend init) and record the outcomes in MULTICHIP_MATRIX.json.
VERDICT r3 item 8: n=8 alone under-evidences the sharding design; n=16/32
exercise mesh construction, ZeRO-1 partitioning and the (n/2, 2) spatial
mesh at scales beyond one host's chips."""

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_one(n: int):
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-c",
         f"import __graft_entry__; __graft_entry__.dryrun_multichip({n})"],
        capture_output=True, text=True, timeout=3600, cwd=str(REPO),
    )
    out = proc.stdout + proc.stderr
    ok = f"dryrun_multichip({n}) spatial ok" in out
    tail = [ln for ln in out.splitlines() if "ok:" in ln or "Error" in ln]
    return {"n_devices": n, "ok": ok, "zero_opt": f"zero_opt ok" in out,
            "spatial": ok, "seconds": round(time.time() - t0, 1),
            "lines": tail[-4:]}


def run_loop_dryrun(n: int):
    """Loop-LEVEL DP validation (VERDICT r4 item 8): the real input pipeline
    (PrefetchLoader → DevicePrefetcher → sharded augment → sharded train
    step) over an n-virtual-device CPU mesh, via bench_loop --cpu-mesh."""
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "tools/bench_loop.py", "--cpu-mesh", str(n)],
        capture_output=True, text=True, timeout=3600, cwd=str(REPO),
        env={**__import__("os").environ,
             "JAX_COMPILATION_CACHE_DIR": str(REPO / ".jax_cache_cpu")},
    )
    rec = {"n_devices": n, "ok": False, "check": "e2e_loop_dp",
           "seconds": round(time.time() - t0, 1)}
    for ln in proc.stdout.splitlines():
        if '"e2e_loop_dp"' in ln:
            rec.update(json.loads(ln))
            break
    else:
        rec["lines"] = (proc.stdout + proc.stderr).splitlines()[-4:]
    return rec


def main():
    ns = [int(a) for a in sys.argv[1:]] or [8, 16, 32]
    results = [run_one(n) for n in ns]
    results.append(run_loop_dryrun(ns[0]))
    path = REPO / "MULTICHIP_MATRIX.json"
    path.write_text(json.dumps({"results": results}, indent=1) + "\n")
    print(json.dumps(results))
    if not all(r["ok"] for r in results):
        sys.exit(1)


if __name__ == "__main__":
    main()
