#!/usr/bin/env python
"""Device-trace attribution for sliding-window inference.

Runs one warm `bench_infer`-equivalent volume prediction under jax.profiler
and prints per-op + per-module totals (reuses profile_step's trace parser),
so inference regressions can be diagnosed instead of guessed at
(VERDICT r3 weak #3 had no attribution tooling for the predict path).

    env PYTHONPATH=/root/repo:/root/.axon_site \
        PROFILE_DIR=/root/repo/artifacts/profile_infer \
        python tools/profile_infer.py
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(__file__))

OUT = os.environ.get("PROFILE_DIR", "/root/repo/artifacts/profile_infer")


def main():
    from profile_step import summarize

    from bench import CLASSES
    from rsuper_tpu.inference import sliding_window_inference
    from rsuper_tpu.models import get_model
    from rsuper_tpu.train.loop import init_params_on_host

    C = len(CLASSES)
    model = get_model("medformer", C, {}, dtype=jnp.bfloat16)
    params = init_params_on_host(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 96, 1)))
    params = jax.device_put(params, jax.devices()[0])

    def apply_fn(p, x):
        out = model.apply(p, x)["segmentation"]
        return out[0] if isinstance(out, (list, tuple)) else out

    vol = np.random.default_rng(0).normal(size=(256, 256, 256)).astype(
        np.float32)

    # warm (compile)
    probs = sliding_window_inference(apply_fn, params, vol, C,
                                     window=(96, 96, 96), batch=4)
    assert np.isfinite(probs).all()

    with jax.profiler.trace(OUT):
        probs = sliding_window_inference(apply_fn, params, vol, C,
                                         window=(96, 96, 96), batch=4)
        np.asarray(probs[0, 0, 0, 0])  # force completion inside the trace

    summarize(OUT)
    return 0


if __name__ == "__main__":
    sys.exit(main())
