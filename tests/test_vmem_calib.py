"""Regression tests for the vmem calibration tooling.

Guards the table-erasure bug class from round 5d: `calibrate_vmem.py --emit`
used to regenerate `ops/vmem_table.py` purely from the (gitignored, hence
mortal) calibration jsonl, so a partial re-calibration silently dropped
hardware-measured rows for every signature the partial sweep did not cover.
The fix is two-sided — emit merges over the live table, and
`tools/seed_calib_from_table.py` reconstitutes jsonl records from the
committed caps — and both sides are exercised here on CPU, no TPU needed.
"""

import importlib.util
import json
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        f"_tool_{name}", REPO / "tools" / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _table_payload(path):
    """Table content modulo comments/blank lines (timings are comments)."""
    lines = []
    for ln in Path(path).read_text().splitlines():
        ln = ln.split("  #")[0].rstrip()
        if ln and not ln.lstrip().startswith("#"):
            lines.append(ln)
    return "\n".join(lines)


def test_seed_then_emit_roundtrip(tmp_path, monkeypatch):
    """Seeding the jsonl from the committed table and re-emitting must
    reproduce the table exactly (modulo timing comments): no caps lost,
    no PREFERRED_FORM / HT / CALIBRATED_TH rows dropped."""
    table = REPO / "rsuper_tpu" / "ops" / "vmem_table.py"
    tmp_table = tmp_path / "vmem_table.py"
    shutil.copy(table, tmp_table)
    jsonl = tmp_path / "calib.jsonl"

    seed = _load_tool("seed_calib_from_table")
    monkeypatch.setattr(seed, "CALIB", jsonl)
    seed.main()
    assert jsonl.exists() and jsonl.read_text().strip()

    # Re-seeding must be idempotent: every cell is already in the jsonl.
    n_before = len(jsonl.read_text().splitlines())
    seed.main()
    assert len(jsonl.read_text().splitlines()) == n_before

    cal = _load_tool("calibrate_vmem")
    monkeypatch.setattr(cal, "CALIB", jsonl)
    monkeypatch.setattr(cal, "TABLE", tmp_table)
    if str(REPO) not in sys.path:
        sys.path.insert(0, str(REPO))
    cal.emit()

    assert _table_payload(tmp_table) == _table_payload(table)


def test_emit_merge_keeps_rows_absent_from_jsonl(tmp_path, monkeypatch):
    """A jsonl holding measurements for ONE cell must not erase the other
    rows — the exact 5d failure (a 96-cubed-only sweep erased the S=4096
    caps and both H-tiled tables)."""
    sys.path.insert(0, str(REPO))
    from rsuper_tpu.ops import vmem_table as vt

    table = REPO / "rsuper_tpu" / "ops" / "vmem_table.py"
    tmp_table = tmp_path / "vmem_table.py"
    shutil.copy(table, tmp_table)
    jsonl = tmp_path / "calib.jsonl"

    # One fresh measurement: a fictitious form-'a' fwd cell at a new S.
    cell = ["plane", "a", "fwd", 1234, 64, 64, 2, False, 8]
    jsonl.write_text(json.dumps({
        "cell": cell, "ok": True, "scoped_bytes": 1.0e6, "ms": 0.5,
        "seconds": 1.0, "error": None}) + "\n")

    cal = _load_tool("calibrate_vmem")
    monkeypatch.setattr(cal, "CALIB", jsonl)
    monkeypatch.setattr(cal, "TABLE", tmp_table)
    cal.emit()

    text = tmp_table.read_text()
    ns = {}
    exec(compile(text, str(tmp_table), "exec"), ns)
    new_caps = ns["MEASURED_TD"]
    # the fresh cell landed ...
    assert new_caps[("a", "fwd", 1234, 64, 64, 2, False)] == 8
    # ... and every pre-existing row survived, including the 128-cubed
    # (S=4096) and H-tiled rows the 5d emit erased.
    for k, v in vt.MEASURED_TD.items():
        assert new_caps[k] == v
    # the timed fresh cell earns its own PREFERRED_FORM row ...
    assert ns["PREFERRED_FORM"].pop(("fwd", 1234, 64, 64, 2, False)) == "a"
    # ... without displacing any existing pick.
    for name in ("PREFERRED_FORM", "PREFERRED_FORM_HT", "CALIBRATED_TH"):
        assert ns[name] == getattr(vt, name)
    assert any(k[2] == 4096 for k in new_caps)
