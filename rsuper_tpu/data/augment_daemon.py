"""Offline crop pre-computation daemon — the AugmentEternal equivalent.

The reference runs a second process that endlessly samples the dataset with
``save_augmented=True``, writing cropped+augmented records and sidecar files
(packbits unk/segment masks, volume/diameter JSONs) that the trainer consumes
with ``--load_augmented`` (``rsuper_train/AugmentEternal.py``,
``dataset_abdomenatlas_UFO.py:936`` save / ``:994`` load).

TPU-first split: the expensive HOST work is IO + report-targeted bbox
cropping; geometric/intensity augmentation is cheap on device
(``pipeline.device_augment``). So the daemon precomputes *cropped records*
(with the affine flag preserved) and the device applies fresh augmentation
every epoch — same training distribution, and the saved crops never go stale
the way fully-baked augmentations do.

Writes are atomic (tmp + rename) so a concurrently-reading trainer never sees
a torn file; readers fall back to resampling another index on failure, like
the reference (:421-433).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import numpy as np

from .dataset import RSuperDataset

_PACKED_KEYS = ("label", "unk", "segment_mask")


def save_record(rec: Dict[str, np.ndarray], dest: str, case_id: str) -> str:
    os.makedirs(dest, exist_ok=True)
    out = {"image": rec["image"].astype(np.float32),
           "volumes": rec["volumes"], "diameters": rec["diameters"],
           "apply_affine": np.asarray(rec.get("apply_affine", 1.0), np.float32)}
    for k in _PACKED_KEYS:
        out[k] = np.packbits(rec[k].astype(bool), axis=0)
        out[k + "_channels"] = np.asarray(rec[k].shape[0])
    path = os.path.join(dest, f"{case_id}.npz")
    tmp = os.path.join(dest, f".tmp_{os.getpid()}_{case_id}.npz")
    np.savez_compressed(tmp, **out)
    os.replace(tmp, path)
    return path


def load_record(dest: str, case_id: str) -> Dict[str, np.ndarray]:
    z = np.load(os.path.join(dest, f"{case_id}.npz"))
    rec = {"image": z["image"], "volumes": z["volumes"],
           "diameters": z["diameters"], "apply_affine": z["apply_affine"]}
    for k in _PACKED_KEYS:
        c = int(z[k + "_channels"])
        rec[k] = np.unpackbits(z[k], axis=0)[:c]
    return rec


class AugmentedRecordDataset:
    """Drop-in replacement for RSuperDataset.sample that reads precomputed
    crops, degrading to another random index on read failure."""

    def __init__(self, dataset: RSuperDataset, destination: str):
        self.dataset = dataset
        self.destination = destination

    def __len__(self):
        return len(self.dataset)

    def sample(self, index: int, rng=None):
        rng = rng or np.random.default_rng()
        for attempt in range(2):
            i = index if attempt == 0 else int(rng.integers(len(self.dataset)))
            case = self.dataset.cases[i % len(self.dataset.cases)]
            try:
                return load_record(self.destination, case.case_id)
            except Exception:
                continue
        # fall back to computing the record online
        return self.dataset.sample(index, rng)


def run_daemon(
    dataset: RSuperDataset,
    destination: str,
    seed: int = 0,
    max_rounds: Optional[int] = None,
    sleep_on_error: float = 10.0,
):
    """Endless loop recomputing every case's crop (reference run_forever
    semantics: crash → wait → continue)."""
    rng = np.random.default_rng(seed)
    rounds = 0
    while max_rounds is None or rounds < max_rounds:
        for i in range(len(dataset)):
            case = dataset.cases[i]
            try:
                rec = dataset.sample(i, rng)
                save_record(rec, destination, case.case_id)
            except Exception as e:  # keep serving like the reference daemon
                print(f"augment daemon error on {case.case_id}: {e}", flush=True)
                time.sleep(sleep_on_error)
        rounds += 1


def main(argv=None):
    """CLI mirror of the trainer's data discovery (reference AugmentEternal):

        python -m rsuper_tpu.data.augment_daemon --data_root masks_npz/ \\
            --report_root reports_npz/ --reports per_tumor.csv \\
            --save_destination crops/ [--rounds N]
    """
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", default=None)
    p.add_argument("--report_root", default=None)
    p.add_argument("--reports", default=None)
    p.add_argument("--save_destination", required=True)
    p.add_argument("--crop_size", type=int, nargs=3, default=(128, 128, 128))
    p.add_argument("--tumor_classes", nargs="+", default=["kidney", "pancreas"])
    p.add_argument("--rounds", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    from train import discover_cases, load_classes  # repo-root CLI helpers

    from .dataset import RSuperDataConfig, RSuperDataset, build_case_list
    from .reports import clean_reports, load_reports

    classes = load_classes(args.data_root) if args.data_root else ()
    report_classes = load_classes(args.report_root) if args.report_root else ()
    mask_cases = discover_cases(args.data_root) if args.data_root else []
    report_cases = discover_cases(args.report_root) if args.report_root else []
    report_rows = None
    if args.reports:
        rows = load_reports(args.reports)
        rows = rows[rows["BDMAP_ID"].isin({c for c, _ in report_cases})]
        rows, usable, _ = clean_reports(rows, list(args.tumor_classes))
        report_cases = [(c, p) for c, p in report_cases if c in set(usable)]
        report_rows = rows

    cases = build_case_list(mask_cases, report_cases, seed=args.seed)
    cfg = RSuperDataConfig(
        classes=tuple(classes), report_classes=tuple(report_classes),
        crop_size=tuple(args.crop_size),
        tumor_classes=tuple(args.tumor_classes),
    )
    dataset = RSuperDataset(cases, cfg, report_rows=report_rows)
    run_daemon(dataset, args.save_destination, seed=args.seed,
               max_rounds=args.rounds)


if __name__ == "__main__":
    main()
