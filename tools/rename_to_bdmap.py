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
    args = p.parse_args(argv)

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
