#!/usr/bin/env python
"""Rename arbitrary CT/mask files to sequential BDMAP ids.

Equivalent of the reference's ``rsuper_train/dataset_conversion/rename_to_BDMAP.py``
/ ``rename_pants.py``: assign ``BDMAP_XXXXXXXX`` ids to every case in a
folder, writing a mapping CSV for traceability.

    python tools/rename_to_bdmap.py --input_dir cts/ --start 1 [--apply]
"""

import argparse
import csv
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_dir", required=True)
    p.add_argument("--start", type=int, default=1)
    p.add_argument("--prefix", default="BDMAP")
    p.add_argument("--apply", action="store_true", help="actually rename")
    p.add_argument("--mapping_csv", default="bdmap_mapping.csv")
    p.add_argument(
        "--replace_prefix", default=None, metavar="SRC",
        help="PanTS-cohort mode (reference rename_pants.py): rename "
             "immediate SUBFOLDERS whose name starts with SRC to start "
             "with --prefix instead (non-recursive; skips existing targets)",
    )
    args = p.parse_args(argv)

    if args.replace_prefix:
        renamed = skipped = 0
        for name in sorted(os.listdir(args.input_dir)):
            src = os.path.join(args.input_dir, name)
            if not os.path.isdir(src) or not name.startswith(args.replace_prefix):
                continue
            new = args.prefix + name[len(args.replace_prefix):]
            dst = os.path.join(args.input_dir, new)
            if os.path.exists(dst):
                print(f"[skip exists] {name} -> {new}")
                skipped += 1
                continue
            if args.apply:
                os.rename(src, dst)
            renamed += 1
            print(f"[{'renamed' if args.apply else 'dry-run'}] {name} -> {new}")
        print(f"{'renamed' if args.apply else 'planned'} {renamed} folders, "
              f"{skipped} skipped")
        return

    files = sorted(
        f for f in os.listdir(args.input_dir)
        if f.endswith((".nii", ".nii.gz", ".npz", ".npy"))
    )
    rows = []
    idx = args.start
    for f in files:
        ext = ".nii.gz" if f.endswith(".nii.gz") else os.path.splitext(f)[1]
        new = f"{args.prefix}_{idx:08d}{ext}"
        rows.append((f, new))
        if args.apply:
            os.rename(os.path.join(args.input_dir, f),
                      os.path.join(args.input_dir, new))
        idx += 1

    with open(os.path.join(args.input_dir, args.mapping_csv), "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["original", "bdmap"])
        w.writerows(rows)
    print(f"{'renamed' if args.apply else 'planned'} {len(rows)} files; "
          f"mapping -> {args.mapping_csv}")


if __name__ == "__main__":
    main()
