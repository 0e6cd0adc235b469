#!/usr/bin/env python
"""Host-loader cost attribution: where does the ~2.7 s/item go?

The round-4 loop bench (`tools/bench_loop.py`) showed the 1-core host loader
dominating steady-state training (VERDICT r4 weak #1). This breaks one
`dataset.sample → pack_record_masks` item into stages so the fix targets the
real cost. Pure CPU; safe to run anywhere.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

from tools.bench_loop import CLASSES, make_cases  # noqa: E402


def t(label, fn, reps=5):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:34s} {ms:8.1f} ms")
    return out, ms


def main():
    size = tuple(int(x) for x in (sys.argv[1:4] or [140, 140, 140]))
    npzs = make_cases(1, size)
    from rsuper_tpu.data import crops
    from rsuper_tpu.data.dataset import (Case, RSuperDataConfig,
                                         RSuperDataset, to_channels_last)
    from rsuper_tpu.data.pipeline import pack_record_masks
    from rsuper_tpu.data.preprocess import load_case

    crop = tuple(c - 44 for c in size)
    dcfg = RSuperDataConfig(
        classes=tuple(CLASSES),
        report_classes=tuple(c for c in CLASSES if "lesion" not in c),
        crop_size=crop, tumor_classes=("pancreas",),
    )
    ds = RSuperDataset([Case("BDMAP_L0", npzs[0], False)], dcfg)
    rng = np.random.default_rng(0)

    _, total = t("dataset.sample (total)", lambda: ds.sample(0, rng))

    z, _ = t("np.load+read arrays",
             lambda: dict(np.load(npzs[0]).items()))
    t("  np.load image only", lambda: np.load(npzs[0])["image"])
    t("  unpackbits(labels)",
      lambda: np.unpackbits(z["labels"], axis=0)[: len(CLASSES)])
    (img, lab), _ = t("load_case", lambda: load_case(
        npzs[0], num_classes=len(CLASSES)))
    t("pad_pair", lambda: crops.pad_pair(img, lab, dcfg.load_size))
    lesion_idx = dcfg.lesion_class_indices()
    t("random_crop_on_tumor", lambda: crops.random_crop_on_tumor(
        img, lab, lesion_idx, dcfg.load_size, True,
        foreground_classes=dcfg.foreground_class_indices(), rng=rng))
    rec, _ = t("to_channels_last",
               lambda: to_channels_last(ds.sample(0, rng)))
    t("pack_record_masks (old CL path)",
      lambda: pack_record_masks(dict(rec), np.float16))
    from rsuper_tpu.data.pipeline import pack_record_cf
    t("sample+pack_record_cf (fast path)",
      lambda: pack_record_cf(ds.sample(0, rng), np.float16))
    rec2 = pack_record_cf(ds.sample(0, rng), np.float16)
    mb = sum(np.asarray(v).nbytes for v in rec2.values()) / 1e6
    print(f"{'packed payload':34s} {mb:8.1f} MB")


if __name__ == "__main__":
    main()
