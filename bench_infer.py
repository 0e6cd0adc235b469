#!/usr/bin/env python
"""Secondary benchmark: sliding-window inference throughput.

Measures whole-volume prediction speed (MedFormer, 96³ windows, half overlap,
8-window batches, on-device accumulation) on a synthetic 256×256×256 CT.
The round-5e hardware A/B measured batch 8 at 6.96 s/volume vs batch 4's
8.6, so 8 is the default (RSUPER_INFER_BATCH overrides) —
the reference's predict path round-trips every window through the CPU
(``inference/inference3d.py:63-103``); this one transfers a single blended
volume. Prints one JSON line: volumes/min/chip.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from bench import CLASSES


def main():
    B = int(os.environ.get("RSUPER_INFER_BATCH", "8"))
    from rsuper_tpu.inference import sliding_window_inference
    from rsuper_tpu.inference.predict import predict_masks_volume
    from rsuper_tpu.models import get_model
    from rsuper_tpu.train.loop import init_params_on_host

    C = len(CLASSES)
    model = get_model("medformer", C, {}, dtype=jnp.bfloat16)
    params = init_params_on_host(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 96, 1))
    )
    params = jax.device_put(params, jax.devices()[0])

    def apply_fn(p, x):
        out = model.apply(p, x)["segmentation"]
        return out[0] if isinstance(out, (list, tuple)) else out

    vol = np.random.default_rng(0).normal(size=(256, 256, 256)).astype(np.float32)

    t0 = time.time()
    probs = sliding_window_inference(apply_fn, params, vol, C,
                                     window=(96, 96, 96), batch=B)
    warm = time.time() - t0  # includes compile

    t0 = time.time()
    reps = 3
    for _ in range(reps):
        probs = sliding_window_inference(apply_fn, params, vol, C,
                                         window=(96, 96, 96), batch=B)
    elapsed = (time.time() - t0) / reps
    assert np.isfinite(probs).all()

    # the --save_probabilities path as the predict CLI actually runs it:
    # packed masks + device-sliced LESION-channel probs, one pass
    # (RSUPER_PROB_WIRE=f16 A/Bs the exact-half transfer vs the u8 default)
    wire = os.environ.get("RSUPER_PROB_WIRE", "u8")
    lesion_idx = [i for i, c in enumerate(CLASSES) if "lesion" in c]
    t0 = time.time()
    out = predict_masks_volume([apply_fn], [params], vol, CLASSES,
                               window=(96, 96, 96), batch=B,
                               prob_channels=lesion_idx, prob_wire=wire)
    warm_prob = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        _, lesion_probs = predict_masks_volume(
            [apply_fn], [params], vol, CLASSES, window=(96, 96, 96),
            batch=B, prob_channels=lesion_idx, prob_wire=wire)
    elapsed_lesion = (time.time() - t0) / reps
    assert lesion_probs.shape == vol.shape + (len(lesion_idx),)

    # the default predict path: device-side threshold + organ gating +
    # bit-packed uint8 transfer (32x less D2H than f32 probabilities)
    t0 = time.time()
    masks = predict_masks_volume([apply_fn], [params], vol, CLASSES,
                                 window=(96, 96, 96), batch=B)
    warm_masks = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        masks = predict_masks_volume([apply_fn], [params], vol, CLASSES,
                                     window=(96, 96, 96), batch=B)
    elapsed_masks = (time.time() - t0) / reps
    assert masks["pancreas"].shape == vol.shape

    print(json.dumps({
        "metric": "sliding_window_volumes_per_min_per_chip"
                  + (f"_b{B}" if B != 8 else ""),
        "value": round(60.0 / elapsed_masks, 2),
        "unit": "256^3 volumes/min (96^3 windows, 0.5 overlap, MedFormer, "
                "device postprocess + packed-mask transfer)",
        "seconds_per_volume": round(elapsed_masks, 2),
        "seconds_per_volume_prob_transfer": round(elapsed, 2),
        "seconds_per_volume_masks_plus_lesion_probs": round(elapsed_lesion, 2),
        "prob_wire": wire,
        "first_call_with_compile_s": round(warm + warm_masks + warm_prob, 1),
    }))


if __name__ == "__main__":
    main()
