#!/usr/bin/env python
"""Training CLI — the TPU-native counterpart of the reference's
``rsuper_train/train_ddp.py``.

Single entry point, no process spawner: one host process drives every local
chip through a data-parallel mesh. Example:

    python train.py --preset abdomenatlas_ufo/medformer_3d \\
        --data_root /data/masks_npz --report_root /data/reports_npz \\
        --reports /data/per_tumor.csv --unique_name run1
"""

import argparse
import glob
import json
import os
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="abdomenatlas_ufo/medformer_3d")
    p.add_argument("--config", default=None, help="YAML config overriding the preset")
    p.add_argument("--data_root", default=None, help="mask-dataset npz dir")
    p.add_argument("--report_root", default=None, help="report-dataset npz dir")
    p.add_argument("--reports", default=None, help="per-tumor metadata CSV")
    p.add_argument("--arch", default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--iter_per_epoch", type=int, default=None)
    p.add_argument("--lr", dest="base_lr", type=float, default=None)
    p.add_argument("--loss", default=None)
    p.add_argument("--report_volume_loss_basic", type=float, default=None)
    p.add_argument("--unique_name", default=None)
    p.add_argument("--cp_path", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--pretrained", default=None)
    p.add_argument("--old_classes", default=None,
                   help="donor checkpoint's class list (YAML/JSON file or "
                        "comma-separated; sorted on load) — remaps output-"
                        "head kernels class by class during --pretrained "
                        "(reference --update_output_layer --old_classes)")
    p.add_argument("--all_train", action="store_true")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--class_weights", action="store_true",
                   help="inverse-prevalence class weighting")
    p.add_argument("--class_weights_csv", default=None,
                   help="per-CT metadata CSV with lesion-instance counts")
    p.add_argument("--report_only", action="store_true",
                   help="train on CT-Report cases only (reference --UFO_only)")
    p.add_argument("--mask_only", action="store_true",
                   help="train on CT-Mask cases only (reference --Atlas_only)")
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler trace for N steps")
    p.add_argument("--clip_pretrain", action="store_true",
                   help="CLIP pretraining: InfoNCE on CT-crop vs report "
                        "embeddings, organ-homogeneous batches")
    p.add_argument("--clip_source", default=None,
                   help="directory of per-case report-embedding .npy files")
    p.add_argument("--k_fold", type=int, default=0,
                   help="k-fold cross-validation (0 = simple split)")
    p.add_argument("--fold", type=int, default=0, help="fold index to run")
    p.add_argument("--zero_opt", action="store_true",
                   help="ZeRO-1: shard Adam moments over the mesh data axis")
    p.add_argument("--zero_ema", action="store_true",
                   help="also shard the EMA parameter copy (gathered once "
                        "per validation)")
    p.add_argument("--spatial_shard", type=int, default=None,
                   help="context parallelism: split each volume's depth over "
                        "an N-chip mesh `model` axis (parallel/mesh.py)")
    # multi-host SPMD (reference --dist_url/--world_size/--rank,
    # train_ddp.py:423-426): one process per host, one global mesh
    p.add_argument("--dist_coordinator", default=None,
                   help="host:port of process 0 (enables multi-host mode)")
    p.add_argument("--dist_num_processes", type=int, default=None)
    p.add_argument("--dist_process_id", type=int, default=None)
    p.add_argument("--local_device_ids", default=None,
                   help="comma-separated device ids this process owns")
    return p.parse_args(argv)


def discover_cases(root):
    """All preprocessed cases under `root`: (case_id, path) from *.npz."""
    out = []
    for path in sorted(glob.glob(os.path.join(root, "*.npz"))):
        out.append((os.path.splitext(os.path.basename(path))[0], path))
    return out


def load_classes(root):
    meta = os.path.join(root, "classes.json")
    if os.path.exists(meta):
        with open(meta) as f:
            return tuple(sorted(json.load(f)))
    raise FileNotFoundError(
        f"{meta} not found: write the sorted class list used at preprocessing"
    )


def main(argv=None):
    args = parse_args(argv)
    from rsuper_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # RSUPER_PLATFORM=cpu → CPU smoke runs
    if args.dist_coordinator:
        # must run before anything touches the jax backend
        from rsuper_tpu.parallel.multihost import init_distributed

        pid, nproc = init_distributed(
            args.dist_coordinator, args.dist_num_processes,
            args.dist_process_id, args.local_device_ids,
        )
        print(f"[dist] process {pid}/{nproc} connected", flush=True)
    from rsuper_tpu.config import load_config

    overrides = {
        k: v
        for k, v in vars(args).items()
        if k not in ("preset", "config", "all_train", "max_steps",
                     "class_weights_csv", "report_only", "mask_only",
                     "profile_steps", "k_fold", "fold", "dist_coordinator",
                     "dist_num_processes", "dist_process_id",
                     "local_device_ids")
        and v is not None
    }
    if args.resume:
        overrides["resume"] = True
    if not args.class_weights:
        overrides.pop("class_weights", None)
    if not args.clip_pretrain:
        overrides.pop("clip_pretrain", None)
    if not args.zero_opt:
        overrides.pop("zero_opt", None)
    if not args.zero_ema:
        overrides.pop("zero_ema", None)
    cfg = load_config(args.preset, args.config, overrides)

    from rsuper_tpu.data.dataset import (
        RSuperDataConfig,
        RSuperDataset,
        build_case_list,
        split_train_test,
    )
    from rsuper_tpu.data.reports import clean_reports, load_reports
    from rsuper_tpu.models import get_model
    from rsuper_tpu.train.loop import train
    import jax.numpy as jnp

    import dataclasses

    classes = cfg.classes or load_classes(cfg.data_root)
    report_classes = cfg.report_classes or (
        load_classes(cfg.report_root) if cfg.report_root else ()
    )
    cfg = dataclasses.replace(cfg, classes=tuple(classes),
                              report_classes=tuple(report_classes))

    mask_cases = discover_cases(cfg.data_root) if cfg.data_root else []
    report_cases = discover_cases(cfg.report_root) if cfg.report_root else []
    report_rows = None
    if cfg.reports:
        rows = load_reports(cfg.reports)
        ids = {c for c, _ in report_cases}
        rows = rows[rows["BDMAP_ID"].isin(ids)]
        rows, usable, _ = clean_reports(rows, list(cfg.tumor_classes))
        report_cases = [(c, p) for c, p in report_cases if c in set(usable)]
        report_rows = rows

    if args.report_only and args.mask_only:
        raise SystemExit("--report_only and --mask_only are mutually exclusive")
    if args.report_only:
        mask_cases = []
    if args.mask_only:
        report_cases = []
    cases = build_case_list(mask_cases, report_cases,
                            balance=cfg.balance_supervision, seed=cfg.seed)
    if args.all_train:
        train_cases, test_cases = cases, []
    elif args.k_fold:
        from rsuper_tpu.data.dataset import kfold_split
        from rsuper_tpu.train.crossval import fold_dir_name

        train_cases, test_cases = kfold_split(cases, args.k_fold, args.fold,
                                              seed=cfg.seed)
        # fold i trains into <cp_path>/<name>_fold<i>/ (crossval.py contract)
        cv_base_name = cfg.unique_name
        cfg = dataclasses.replace(
            cfg, unique_name=fold_dir_name(cfg.unique_name, args.fold)
        )
    else:
        train_cases, test_cases = split_train_test(cases, seed=cfg.seed)

    dcfg = RSuperDataConfig(
        classes=tuple(classes),
        report_classes=tuple(report_classes),
        crop_size=tuple(cfg.training_size),
        tumor_classes=tuple(cfg.tumor_classes),
    )
    proportions = None
    if cfg.class_weights and args.class_weights_csv:
        import pandas as pd

        from rsuper_tpu.data.class_weights import class_proportions

        lesion_names = [c for c in classes if "lesion" in c]
        proportions = class_proportions(
            pd.read_csv(args.class_weights_csv),
            [c.case_id for c in train_cases], lesion_names,
        )
    is_2d = cfg.dimension == "2d" or (
        cfg.dimension == "auto" and len(cfg.training_size) == 2
    )
    if is_2d:
        from rsuper_tpu.data.dataset2d import SliceDataConfig, SliceDataset

        if any(c.is_report for c in train_cases):
            raise SystemExit("the 2D pathway trains on CT-Mask slices only "
                             "(report supervision is volumetric)")
        dataset = SliceDataset(
            train_cases,
            SliceDataConfig(classes=tuple(classes),
                            crop_size=tuple(cfg.training_size)),
        )
    else:
        dataset = RSuperDataset(train_cases, dcfg, report_rows=report_rows,
                                class_proportions=proportions)

    model_args = dict(cfg.model_args)
    if cfg.clip_pretrain:
        if not cfg.clip_source:
            raise SystemExit("--clip_pretrain needs --clip_source "
                             "(per-case report-embedding .npy directory)")
        from rsuper_tpu.data.clip import ClipRecordAdapter, ReportEmbeddingStore

        model_args.setdefault("clip_branch", True)
        dataset = ClipRecordAdapter(
            dataset, ReportEmbeddingStore(cfg.clip_source),
            dim=model_args.get("clip_feats", 768),
        )

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    model = get_model(cfg.arch, len(classes), model_args, dtype=dtype)

    def iter_test_cases():
        """Lazily load (image, labels) pairs for in-training validation
        (only CT-Mask cases carry full ground truth)."""
        from rsuper_tpu.data.preprocess import load_case

        for c in test_cases:
            if c.is_report:
                continue
            yield load_case(c.path, num_classes=len(classes))

    class _LazyTestCases:  # re-iterable: validation may run every val_freq epochs
        def __iter__(self):
            return iter_test_cases()

    state = train(cfg, model, dataset,
                  test_cases=_LazyTestCases() if test_cases else None,
                  max_steps=args.max_steps, profile_steps=args.profile_steps)

    if args.k_fold and test_cases:
        # final per-fold validation + cross_validation summary when the last
        # fold completes (reference train_ddp.py:751-779)
        import jax

        from rsuper_tpu.train.crossval import (
            summarize_cross_validation,
            write_fold_results,
        )
        from rsuper_tpu.train.validation import run_validation

        results = run_validation(model, state, cfg, _LazyTestCases(),
                                 len(classes), is_2d=is_2d)
        if jax.process_index() == 0:
            exp_dir = f"{cfg.cp_path}/{cfg.unique_name}"
            write_fold_results(exp_dir, args.fold, args.k_fold, classes,
                               results)
            out = summarize_cross_validation(cfg.cp_path, cv_base_name,
                                             args.k_fold, classes)
            if out:
                print(f"[crossval] wrote {out}", flush=True)


if __name__ == "__main__":
    main()
