#!/usr/bin/env python
"""Steady-state END-TO-END training throughput on the real TPU chip.

bench.py times the jitted train step alone; the real loop also pays host
sampling (PrefetchLoader), the host→device transfer and the on-device
augmentation pass, all of which serialise with the step on a single chip.
The driver's round-3 batch measured device_augment alone at 134.5 ms/step —
MORE than the 96 ms step — so the step-only headline over-stated steady
state by >2× (VERDICT r3 weak #2). This bench runs the REAL loop machinery
(PrefetchLoader → local_batch_to_global → build_augment_step → train step)
over synthetic preprocessed cases for ≥20 steps and prints one JSON line.

    env PYTHONPATH=/root/repo:/root/.axon_site \
        JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
        python tools/bench_loop.py [--steps 24] [--augment device|off]

RSUPER_AUG_FULLWARP=1 A/Bs the pre-round-3 full-volume warp graph.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

CLASSES = [
    "background", "aorta", "gall_bladder", "kidney_left", "kidney_right",
    "kidney_lesion", "liver", "liver_lesion", "pancreas", "pancreas_head",
    "pancreas_body", "pancreas_tail", "pancreatic_lesion", "postcava",
    "spleen", "stomach",
]
CASE_DIR = Path("/root/repo/.bench_cases")  # gitignored, reused across runs


def make_cases(n: int, size):
    """Synthetic preprocessed cases big enough for the 96³ load window."""
    from rsuper_tpu.data.nifti import write_nifti
    from rsuper_tpu.data.preprocess import preprocess_case

    CASE_DIR.mkdir(exist_ok=True)
    out = []
    for i in range(n):
        npz = CASE_DIR / f"BDMAP_L{i}.npz"
        out.append(str(npz))
        if npz.exists():
            continue
        rng = np.random.default_rng(i)
        ct = rng.normal(scale=30.0, size=size).astype(np.float32)
        organ = np.zeros(size, np.uint8)
        organ[30:90, 40:100, 40:100] = 1
        lesion = np.zeros_like(organ)
        lesion[50:70, 60:84, 60:84] = 1
        ct[organ > 0] += 120.0
        ct[lesion > 0] += 160.0
        aff = np.eye(4)
        write_nifti(str(CASE_DIR / "ct.nii.gz"), ct, aff)
        write_nifti(str(CASE_DIR / "organ.nii.gz"), organ, aff)
        write_nifti(str(CASE_DIR / "lesion.nii.gz"), lesion, aff)
        preprocess_case(
            str(CASE_DIR / "ct.nii.gz"),
            {"background": None,
             "pancreas": str(CASE_DIR / "organ.nii.gz"),
             "pancreatic_lesion": str(CASE_DIR / "lesion.nii.gz")},
            str(npz), classes=CLASSES, min_size=size,
        )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--warmup", type=int, default=4)
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--augment", choices=("device", "host", "off"),
                    default="device")
    ap.add_argument("--no-overlap", action="store_true",
                    help="round-4 inline transfer path (A/B baseline)")
    ap.add_argument("--cpu-mesh", type=int, default=0, metavar="N",
                    help="run the FULL loop (loader -> DevicePrefetcher -> "
                         "sharded augment -> sharded train step) on an "
                         "N-virtual-device CPU mesh — the loop-level DP "
                         "dryrun; prints a MULTICHIP-style JSON line")
    args = ap.parse_args()
    if args.cpu_mesh:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_mesh}"
        )
        jax.config.update("jax_platforms", "cpu")
        args.batch = args.cpu_mesh  # one item per device
        args.size = min(args.size, 32)
        args.steps = min(args.steps, 2)
        args.warmup = min(args.warmup, 1)
        # fewer loader threads: they timeshare the same core as the 8
        # device-shard threads, and a starved shard can miss XLA:CPU's 40 s
        # collective-rendezvous deadline
        args.workers = min(args.workers, 2)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    from jax.sharding import Mesh

    from rsuper_tpu.data.dataset import Case, RSuperDataConfig, RSuperDataset
    from rsuper_tpu.data.pipeline import PrefetchLoader, build_augment_step
    from rsuper_tpu.losses import LesionChannelMap, LossConfig
    from rsuper_tpu.models import get_model
    from rsuper_tpu.parallel.multihost import local_batch_to_global
    from rsuper_tpu.train import build_train_step, make_optimizer
    from rsuper_tpu.train.loop import init_params_on_host
    from rsuper_tpu.train.state import TrainState

    S = args.size
    crop = (S, S, S)
    case_size = tuple(c + 44 for c in crop)  # ≥ load_size margin
    npzs = make_cases(4, case_size)
    dcfg = RSuperDataConfig(
        classes=tuple(CLASSES),
        report_classes=tuple(c for c in CLASSES if "lesion" not in c),
        crop_size=crop, tumor_classes=("pancreas",),
    )
    dataset = RSuperDataset(
        [Case(f"BDMAP_L{i}", p, False) for i, p in enumerate(npzs)], dcfg)

    n_mesh = max(1, args.cpu_mesh)
    mesh = Mesh(np.asarray(jax.devices()[:n_mesh]).reshape(n_mesh), ("data",))
    lmap = LesionChannelMap.from_classes(CLASSES)
    if args.cpu_mesh:
        # the loop-level DP dryrun validates the PIPELINE composition
        # (loader → DevicePrefetcher → sharded augment → sharded step), not
        # throughput — use the dryrun_multichip-class tiny MedFormer: the
        # full model at 32³ × 8 shards timesharing ONE core blows XLA:CPU's
        # hardcoded 40 s collective-rendezvous window (observed F-check
        # "Termination timeout for all reduce ... only 1 of them arrived")
        model_cfg = {"base_chan": 4,
                     "chan_num": (8, 16, 16, 16, 16, 16, 8, 4),
                     "num_heads": (1, 2, 2, 2, 2, 2, 1, 1),
                     "fusion_dim": 16, "fusion_heads": 2,
                     "trans_num": (0, 1, 1, 1, 1, 1, 0, 0),
                     "conv_num": (1, 0, 0, 0, 0, 0, 1, 1)}
        model = get_model("medformer", len(CLASSES), model_cfg,
                          dtype=jnp.float32)
    else:
        model = get_model("medformer", len(CLASSES), {}, dtype=jnp.bfloat16)
    tx = make_optimizer(base_lr=6e-4, warmup_epochs=0, max_epochs=100,
                        steps_per_epoch=1000)
    params = init_params_on_host(
        model, jax.random.PRNGKey(0), jnp.zeros((1, S, S, S, 1)))
    if args.cpu_mesh:
        from jax.sharding import NamedSharding, PartitionSpec as P

        dev = NamedSharding(mesh, P())  # replicated over the data axis
    else:
        dev = jax.devices()[0]
    state = TrainState(
        params=jax.device_put(params, dev),
        opt_state=jax.device_put(tx.init(params), dev),
        ema_params=jax.device_put(jax.tree.map(jnp.copy, params), dev),
        step=jax.device_put(jnp.zeros((), jnp.int32), dev),
        tx=tx,
    )
    step_fn = build_train_step(model, lmap, LossConfig(loss="ball_dice_last"),
                               mesh=mesh if args.cpu_mesh else None)
    augment_fn = None
    transform = None
    if args.augment == "device":
        augment_fn = build_augment_step(
            mesh, crop_size=crop, scale=(0.1, 0.1, 0.1),
            rotate=(30.0, 30.0, 30.0), out_dtype=jnp.bfloat16,
            num_classes=len(CLASSES))
    elif args.augment == "host":
        from rsuper_tpu.data.host_augment import make_host_augment

        transform = make_host_augment(crop, scale=(0.1, 0.1, 0.1),
                                      rotate=(30.0, 30.0, 30.0),
                                      out_dtype=jnp.bfloat16)
    else:  # off: loader records are load_size — crop to the step's shape
        from rsuper_tpu.data.host_augment import make_host_augment

        transform = make_host_augment(crop, affine_prob=0.0,
                                      intensity_prob=0.0,
                                      out_dtype=jnp.bfloat16)

    total = args.warmup + args.steps
    indices = [i % len(dataset) for i in range(total * args.batch)]
    loader = PrefetchLoader(dataset, args.batch, indices,
                            num_workers=args.workers, transform=transform,
                            # mirror train/loop.py: packed-byte mask transfer
                            # whenever the augment pass runs on device
                            pack_masks=augment_fn is not None)
    aug_key = jax.random.PRNGKey(1)

    # decompose: pure H2D cost of one loader batch (the axon relay tunnels
    # device transfers over the network, so on this rig H2D can dominate the
    # loop; on a real host it is PCIe/local — report it separately so the
    # e2e number is attributable)
    from rsuper_tpu.data.dataset import to_channels_last
    from rsuper_tpu.data.pipeline import pack_record_masks

    probe_rng = np.random.default_rng(0)
    probe = to_channels_last(dataset.sample(0, probe_rng))
    if transform is not None:
        probe = transform(probe, probe_rng)
    elif loader.pack_masks:
        probe = pack_record_masks(dict(probe), loader.image_transfer_dtype)
    h2d_bytes = sum(np.asarray(v).nbytes for v in probe.values())
    dev = jax.devices()[0]
    for _ in range(2):  # warm the transfer path
        jax.block_until_ready(jax.device_put(probe, dev))
    t = time.time()
    reps = 3
    for _ in range(reps):
        jax.block_until_ready(jax.device_put(probe, dev))
    h2d_ms = (time.time() - t) / reps * 1e3

    n = 0
    t0 = None
    losses = None
    if args.no_overlap:  # round-4 inline path: transfer+augment on the
        def batches():   # critical path (A/B baseline)
            key = aug_key
            for batch in loader:
                key, k = jax.random.split(key)
                keys = jax.random.split(k, args.batch)
                batch = local_batch_to_global(batch, mesh)
                if augment_fn is not None:
                    batch = augment_fn(batch, keys)
                yield batch

        batches = batches()
    else:
        from rsuper_tpu.data.pipeline import DevicePrefetcher

        batches = DevicePrefetcher(loader, mesh, augment_fn=augment_fn,
                                   key=aug_key, global_batch=args.batch)
    for batch in batches:
        state, losses = step_fn(state, batch)
        n += 1
        if n == args.warmup:
            _ = float(losses["overall"])  # drain compile + queued steps
            t0 = time.time()
    final = float(losses["overall"])  # sync the whole chain
    elapsed = time.time() - t0
    steps = n - args.warmup
    value = steps * args.batch / elapsed
    if args.cpu_mesh:
        # loop-level DP dryrun verdict, MULTICHIP_MATRIX-style
        print(json.dumps({
            "check": "e2e_loop_dp",
            "n_devices": args.cpu_mesh,
            "ok": bool(np.isfinite(final)),
            "steps": steps,
            "global_batch": args.batch,
            "loss": round(final, 4),
            "augment": args.augment,
            "overlap": not args.no_overlap,
        }))
        return
    print(json.dumps({
        "metric": f"e2e_train_patches_per_sec_per_chip_{S}"
                  + ("" if args.augment == "device" else f"_{args.augment}")
                  + ("_fullwarp" if os.environ.get("RSUPER_AUG_FULLWARP")
                     else "")
                  + ("_inline" if args.no_overlap else ""),
        "value": round(value, 3),
        "unit": f"{S}^3 patches/s/chip (loader+h2d+augment+step, "
                f"{steps} steps)",
        "loss": round(final, 4),
        "h2d_ms_per_item": round(h2d_ms, 1),
        "h2d_mb_per_item": round(h2d_bytes / 1e6, 1),
    }))


if __name__ == "__main__":
    main()
