#!/usr/bin/env python
"""Capture a device trace of the full bench train step and print the top ops.

Runs the exact bench.py graph (cached compile) under jax.profiler with a
perfetto trace, then parses the trace and prints per-op totals so the hot
fusions are visible without TensorBoard. Usage (TPU):

    env PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_step.py
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

OUT = os.environ.get("PROFILE_DIR", "/root/repo/profile_r2")


def build():
    import bench

    from rsuper_tpu.losses import LesionChannelMap, LossConfig
    from rsuper_tpu.models import get_model
    from rsuper_tpu.train import build_train_step, make_optimizer
    from rsuper_tpu.train.loop import init_params_on_host
    from rsuper_tpu.train.state import TrainState

    dev = jax.devices()[0]
    CLASSES, BATCH, SIZE = bench.CLASSES, bench.BATCH, bench.SIZE
    lmap = LesionChannelMap.from_classes(CLASSES)
    C = len(CLASSES)
    model = get_model("medformer", C, {"remat": bench.REMAT}, dtype=jnp.bfloat16)
    tx = make_optimizer(base_lr=6e-4, warmup_epochs=0, max_epochs=100,
                        steps_per_epoch=1000)
    rng = np.random.default_rng(0)
    ci = CLASSES.index("pancreatic_lesion")
    seg = np.zeros((BATCH, SIZE, SIZE, SIZE, C), np.float32)
    seg[0, 24:72, 24:72, 24:72, ci] = 1.0
    lab = np.zeros_like(seg)
    vols = np.zeros((BATCH, 10), np.float32)
    vols[0, :2] = [4000.0, 900.0]
    dias = np.zeros((BATCH, 10, 3), np.float32)
    dias[0, 0] = [20.0, 18.0, 16.0]
    dias[0, 1] = [12.0, 12.0, 10.0]
    batch = {
        "image": rng.normal(size=(BATCH, SIZE, SIZE, SIZE, 1)).astype(np.float32),
        "label": lab,
        "unk": seg.copy(),
        "segment_mask": seg,
        "volumes": vols,
        "diameters": dias,
    }
    batch = {k: jax.device_put(jnp.asarray(v), dev) for k, v in batch.items()}
    params = init_params_on_host(
        model, jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, SIZE, 1)))
    state = TrainState(
        params=jax.device_put(params, dev),
        opt_state=jax.device_put(tx.init(params), dev),
        ema_params=jax.device_put(jax.tree.map(jnp.copy, params), dev),
        step=jax.device_put(jnp.zeros((), jnp.int32), dev),
        tx=tx,
    )
    step = build_train_step(model, lmap, LossConfig(loss="ball_dice_last"))
    return step, state, batch


def summarize(trace_dir):
    paths = glob.glob(f"{trace_dir}/**/*.json.gz", recursive=True) + glob.glob(
        f"{trace_dir}/**/*.trace.json", recursive=True)
    if not paths:
        print("no perfetto trace found under", trace_dir)
        print("files:", glob.glob(f"{trace_dir}/**/*", recursive=True))
        return
    path = max(paths, key=os.path.getmtime)
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data
    # device tracks: pid names containing TPU / device
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "device" in n.lower() or "XLA" in n}
    totals = defaultdict(float)
    counts = defaultdict(int)
    op_meta = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        totals[name] += dur
        counts[name] += 1
        total += dur
        args = e.get("args") or {}
        meta = " ".join(
            str(args[k]) for k in ("tf_op", "source", "shape") if args.get(k)
        )
        if meta and name not in op_meta:
            op_meta[name] = meta
    print(f"\n== trace {os.path.basename(path)}: {total:.1f} ms total device "
          f"time across {sum(counts.values())} events ==")
    print(f"{'ms':>9} {'n':>5}  op")
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:60]:
        meta = op_meta.get(name, "")
        print(f"{ms:9.2f} {counts[name]:5d}  {name[:80]}"
              + (f"  <- {meta[:140]}" if meta else ""))

    # module-level attribution from the per-op tf_op metadata: group by the
    # model submodule (e.g. UpBlockMF_3/BasicBlock_0 fwd vs bwd) / loss source
    # line so the hot SUBSYSTEM is visible without hand-parsing the trace.
    # Nested control flow (cond/while bodies) double-counts against its outer
    # conditional op — read groups as attribution, not a disjoint partition.
    mod_tot = defaultdict(float)
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        src = (e.get("args") or {}).get("tf_op") or ""
        if not src:
            continue
        dur = e.get("dur", 0) / 1e3
        if src.startswith("/"):  # loss source line, e.g. .../losses/ball.py:409
            key = "loss " + "/".join(src.rsplit("/", 2)[-2:])
        else:
            parts = src.split("/")
            bwd = any(p.startswith("transpose(jvp") for p in parts)
            mods = [p for p in parts if any(
                p.startswith(s) for s in (
                    "DownBlockMF", "UpBlockMF", "BasicBlock", "PatchMerging",
                    "SemanticMapFusion", "Conv_0", "outc", "cls_", "clip_",
                ))]
            key = ("model " + "/".join(mods[:2]) if mods else
                   "other " + parts[-1].split(":")[0])
            key += " [bwd]" if bwd else " [fwd]"
        mod_tot[key] += dur
    print("\n== by module (tf_op metadata; nested regions double-count) ==")
    for k, ms in sorted(mod_tot.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{ms:9.2f}  {k[:110]}")


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass
    step, state, batch = build()
    state, losses = step(state, batch)  # compile (cached)
    print("warmup loss:", float(losses["overall"]), flush=True)
    os.makedirs(OUT, exist_ok=True)
    with jax.profiler.trace(OUT, create_perfetto_trace=True):
        for _ in range(3):
            state, losses = step(state, batch)
        _ = float(losses["overall"])
    summarize(OUT)


if __name__ == "__main__":
    main()
