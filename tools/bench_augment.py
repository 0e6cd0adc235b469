#!/usr/bin/env python
"""Measure the on-device augmentation pass on the real TPU chip.

The train loop runs ``build_augment_step`` before every step; bench.py times
the train step alone, so this is the remaining per-step cost on the real
training critical path (docs/perf.md roadmap: 73 ms/step measured on CPU
after the bit-packed mask affine — this tool gets the TPU number).

    env PYTHONPATH=/root/repo:/root/.axon_site \
        JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
        python tools/bench_augment.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    from jax.sharding import Mesh

    from rsuper_tpu.data.pipeline import build_augment_step

    B = int(os.environ.get("AUG_BATCH", "1"))
    C = 16
    load = (116, 136, 136)  # load_size for 96^3 crops (bench config)
    crop = (96, 96, 96)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    fn = build_augment_step(mesh, crop_size=crop, scale=(0.1, 0.1, 0.1),
                            rotate=(30.0, 30.0, 30.0))

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, *load, 1)), jnp.float32),
        "label": jnp.asarray(
            rng.random(size=(B, *load, C)) > 0.9, jnp.float32),
        "unk": jnp.zeros((B, *load, C), jnp.float32),
        "segment_mask": jnp.asarray(
            rng.random(size=(B, *load, C)) > 0.9, jnp.float32),
        "volumes": jnp.zeros((B, 10), jnp.float32),
        "diameters": jnp.zeros((B, 10, 3), jnp.float32),
    }
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    out = fn(batch, keys)
    float(jnp.sum(out["image"]))  # warmup + compile barrier

    reps = 10
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(batch, keys)
        # fetch a scalar: block_until_ready through the relay is unreliable
        float(jnp.sum(out["image"]))
    dt = (time.perf_counter() - t0) / reps
    # default (shear image warp) prints the bare metric; the explicit A/B
    # variants get suffixes so chain logs stay unambiguous
    suffix = ""
    if os.environ.get("RSUPER_AUG_FULLWARP"):
        suffix = "_fullwarp"
    elif os.environ.get("RSUPER_AUG_SHEAR") == "0":
        suffix = "_gather"
    elif os.environ.get("RSUPER_AUG_SHEAR"):
        suffix = "_shear"
    print(json.dumps({
        "metric": "device_augment_ms_per_step" + suffix,
        "value": round(dt * 1e3, 2),
        "unit": f"ms per {B}x{load} -> {crop} augment (TPU)",
    }))


if __name__ == "__main__":
    main()
