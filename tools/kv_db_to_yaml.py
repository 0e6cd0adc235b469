#!/usr/bin/env python
"""Export a SQLite key/value store to one YAML file per row.

Counterpart of the reference's ``rsuper_train/db_2_yaml.py`` (dump a kv .db
of crop descriptors into ``<key>_crop.yaml`` files, one-element-sequence
YAML payloads). Accepts a .db file or a folder containing one.

    python tools/kv_db_to_yaml.py --db_folder crops.db --dest yaml_out/
"""

import argparse
import sqlite3
import sys
from pathlib import Path

import yaml


def find_db(path: Path) -> Path:
    if path.is_file():
        return path
    dbs = sorted(path.glob("*.db"))
    if not dbs:
        sys.exit(f"no .db file found in {path}")
    if len(dbs) > 1:
        print(f"multiple .db files in {path}; using {dbs[0].name}")
    return dbs[0]


def export_rows(db_file: Path, dest: Path) -> int:
    dest.mkdir(parents=True, exist_ok=True)
    with sqlite3.connect(db_file) as conn:
        rows = conn.execute("SELECT key, value FROM kv;").fetchall()
    for key, value in rows:
        with open(dest / f"{key}_crop.yaml", "w", encoding="utf-8") as f:
            yaml.safe_dump([value], f, default_flow_style=False,
                           sort_keys=False)
    return len(rows)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--db_folder", required=True,
                   help="folder or full path of the .db file")
    p.add_argument("--dest", required=True)
    args = p.parse_args(argv)
    n = export_rows(find_db(Path(args.db_folder).expanduser().resolve()),
                    Path(args.dest).expanduser().resolve())
    print(f"wrote {n} yaml files")


if __name__ == "__main__":
    main()
