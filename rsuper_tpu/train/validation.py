"""In-training validation: sliding-window inference per test case, Dice +
surface distances per class.

Reference: ``rsuper_train/training/validation.py`` (threshold 0.5 multi-label
sigmoid, Dice via blockwise split, ASD/HD95 with NaN→500 clamp, per-class
mean over cases containing the class). The DDP all_gather/pad-removal dance
is unnecessary here: validation runs on the host process over device-computed
probabilities.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence

import numpy as np

from ..inference import sliding_window_inference
from ..metrics import average_surface_distance, dice_score, hausdorff95


def validate_cases(
    apply_fn: Callable,
    params,
    cases: Sequence,  # iterable of (image (D,H,W), labels (C,D,H,W))
    num_classes: int,
    window=(128, 128, 128),
    threshold: float = 0.5,
    compute_distances: bool = True,
    batch: int = 4,
) -> Dict[str, np.ndarray]:
    """Returns per-class mean dice/asd/hd95 over cases where the class exists."""
    dices = np.zeros(num_classes)
    asds = np.zeros(num_classes)
    hds = np.zeros(num_classes)
    counts = np.zeros(num_classes)

    for image, labels in cases:
        probs = sliding_window_inference(
            apply_fn, params, image, num_classes, window=window, batch=batch
        )
        pred = probs > threshold
        for c in range(num_classes):
            target = labels[c] > 0
            if not target.any():
                continue
            counts[c] += 1
            dices[c] += dice_score(pred[..., c], target)
            if compute_distances:
                asds[c] += average_surface_distance(pred[..., c], target)
                hds[c] += hausdorff95(pred[..., c], target)

    denom = np.maximum(counts, 1)
    return {
        "dice": dices / denom,
        "asd": asds / denom,
        "hd95": hds / denom,
        "cases_per_class": counts,
    }


def validate_cases_2d(
    apply_fn: Callable,
    params,
    cases: Sequence,  # iterable of (image (D,H,W), labels (C,D,H,W))
    num_classes: int,
    window=(256, 256),
    threshold: float = 0.5,
    batch: int = 8,
) -> Dict[str, np.ndarray]:
    """2D-pathway validation: slice-wise sliding-window inference stacked back
    into the volume, volumetric Dice per class (the reference's 2D mode
    evaluates the same way: per-slice forward, 3D metric)."""
    from ..inference.sliding_window2d import sliding_window_inference_2d

    dices = np.zeros(num_classes)
    counts = np.zeros(num_classes)
    for image, labels in cases:
        probs = sliding_window_inference_2d(
            apply_fn, params, image, num_classes, window=window, batch=batch
        )
        pred = probs > threshold
        for c in range(num_classes):
            target = labels[c] > 0
            if not target.any():
                continue
            counts[c] += 1
            dices[c] += dice_score(pred[..., c], target)
    denom = np.maximum(counts, 1)
    return {"dice": dices / denom, "cases_per_class": counts}


def run_validation(model, state, cfg, cases, num_classes: int,
                   is_2d: bool = False) -> Dict[str, np.ndarray]:
    """The single validation harness shared by the in-loop val pass and the
    end-of-fold crossval pass (reference runs the same eval_net at
    ``train_ddp.py:388`` and ``:751``): deep-supervision head selection,
    EMA-vs-raw param choice, multihost-safe param materialisation, and the
    2D/3D dispatch live HERE so the two call sites cannot drift."""
    import jax

    def apply_fn(params, x):
        out = model.apply(params, x)["segmentation"]
        return out[0] if isinstance(out, (list, tuple)) else out

    val_params = state.ema_params if cfg.ema else state.params
    if jax.process_count() > 1:
        # run per-host on a local copy (mixing globally-replicated params
        # with host-local windows in one jit is illegal); every process
        # computes the identical metric, so collective best-checkpoint
        # saves stay consistent
        val_params = jax.device_get(val_params)
    validate = validate_cases_2d if is_2d else validate_cases
    return validate(apply_fn, val_params, cases, num_classes,
                    window=cfg.training_size)
