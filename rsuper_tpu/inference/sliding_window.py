"""Sliding-window inference, TPU-batched with on-device accumulation.

Reference: ``rsuper_train/inference/inference3d.py:28-107``
(``inference_sliding_window``): a half-window-stride grid over D,H,W, one
window per forward pass, sigmoid, accumulate into a **CPU** tensor with a hit
counter, divide (uniform blending).

TPU-first redesign:
* windows are processed in **batches** (fills the MXU instead of B=1 convs);
* the probability accumulator and hit counter live **on device** — the
  reference's per-window device→host round-trip (its main inference
  inefficiency) is gone; only the final blended volume is transferred;
* the window grid is computed host-side from the (padded) volume shape; the
  gather/forward/scatter loop is one jitted `lax.scan` over window batches
  with static shapes — volumes are padded up to the stride grid, and a shape
  bucket cache keeps recompiles rare;
* organ-gated window skipping (``inference3d.py:83``) is handled by masking:
  windows whose organ-mask overlap is empty contribute zeros.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def window_starts(size: int, window: int, stride: int) -> list:
    """Start offsets covering [0, size) with `stride`, last window clamped
    flush to the end (same coverage rule as the reference's ``split_idx``,
    ``inference/utils.py:29``)."""
    if size <= window:
        return [0]
    n = math.ceil((size - window) / stride)
    starts = [min(i * stride, size - window) for i in range(n + 1)]
    return sorted(set(starts))


def _grid(shape, window, stride):
    zs = window_starts(shape[0], window[0], stride[0])
    ys = window_starts(shape[1], window[1], stride[1])
    xs = window_starts(shape[2], window[2], stride[2])
    return np.array([(z, y, x) for z in zs for y in ys for x in xs], np.int32)


def _gaussian_window(window, sigma_scale: float = 0.125):
    """nnU-Net-style importance map: centre voxels outweigh window borders."""
    ws = []
    for w in window:
        c = (w - 1) / 2.0
        x = np.arange(w) - c
        ws.append(np.exp(-(x**2) / (2 * (w * sigma_scale) ** 2)))
    m = ws[0][:, None, None] * ws[1][None, :, None] * ws[2][None, None, :]
    m = m / m.max()
    return jnp.asarray(np.maximum(m, 1e-4), jnp.float32)[..., None]


@partial(jax.jit, static_argnames=("apply_fn", "window", "batch", "num_classes",
                                   "blend"))
def _run_windows(apply_fn, params, volume, starts, valid, window, batch,
                 num_classes, blend="uniform"):
    """volume: (D, H, W, 1), any float dtype (f16 transfer upcasts here —
    halves the H2D payload over the relay). starts: (N, 3) padded to a
    multiple of `batch`. valid: (N,) 0/1. Returns the BLENDED probability
    volume (D, H, W, C) f32 — accumulation, hit counting and the final
    division all live in this one jit: probs and the blend weight share a
    single (C+1)-channel accumulator so each window costs ONE
    slice+add+update pass (the split acc/cnt layout spent ~420 ms/volume in
    doubled dynamic_update_slice traffic, round-4 `exp_profile_infer.log`)."""
    volume = volume.astype(jnp.float32)
    D, H, W, _ = volume.shape
    acc = jnp.zeros((D, H, W, num_classes + 1), jnp.float32)
    n_batches = starts.shape[0] // batch
    wmap = _gaussian_window(window) if blend == "gaussian" else jnp.ones(
        (*window, 1), jnp.float32
    )

    def gather(start):
        return jax.lax.dynamic_slice(
            volume, (start[0], start[1], start[2], 0), (*window, 1)
        )

    def body(acc, i):
        sl = jax.lax.dynamic_slice(starts, (i * batch, 0), (batch, 3))
        vl = jax.lax.dynamic_slice(valid, (i * batch,), (batch,))
        wins = jax.vmap(gather)(sl)
        probs = jax.nn.sigmoid(apply_fn(params, wins).astype(jnp.float32))
        w = vl[:, None, None, None, None] * wmap[None]
        upd = jnp.concatenate(
            [probs * w, jnp.broadcast_to(w, (batch, *window, 1))], axis=-1
        )

        def scatter(acc, j):
            s = sl[j]
            idx = (s[0], s[1], s[2], 0)
            a = jax.lax.dynamic_slice(acc, idx, (*window, num_classes + 1))
            return jax.lax.dynamic_update_slice(acc, a + upd[j], idx), None

        acc, _ = jax.lax.scan(scatter, acc, jnp.arange(batch))
        return acc, None

    acc, _ = jax.lax.scan(body, acc, jnp.arange(n_batches))
    return acc[..., :num_classes] / jnp.maximum(acc[..., num_classes:], 1e-4)


def sliding_window_probs_device(
    apply_fn: Callable,
    params,
    volume: np.ndarray,
    num_classes: int,
    window: Sequence[int] = (128, 128, 128),
    overlap: float = 0.5,
    batch: int = 8,
    organ_mask: Optional[np.ndarray] = None,
    blend: str = "uniform",
):
    """Blended sigmoid probabilities for one volume, LEFT ON DEVICE as a
    (D, H, W, C) float32 jax array (cropped to the input shape). Lets callers
    ensemble-sum / threshold / bit-pack on device before any host transfer
    (the big inference win over slow links — see `predict.py`)."""
    window = tuple(window)
    stride = tuple(max(1, int(w * (1.0 - overlap))) for w in window)
    orig_shape = volume.shape
    pad = [max(0, w - s) for s, w in zip(orig_shape, window)]
    if any(pad):
        volume = np.pad(volume, [(0, p) for p in pad])
        if organ_mask is not None:
            organ_mask = np.pad(organ_mask, [(0, p) for p in pad])
    shape = volume.shape

    starts = _grid(shape, window, stride)
    if organ_mask is not None:
        keep = []
        for s in starts:
            sl = tuple(slice(a, a + w) for a, w in zip(s, window))
            keep.append(bool(organ_mask[sl].any()))
        starts = starts[np.asarray(keep)] if any(keep) else starts[:1]

    n = len(starts)
    n_pad = (-n) % batch
    valid = np.concatenate([np.ones(n, np.float32), np.zeros(n_pad, np.float32)])
    starts = np.concatenate([starts, np.repeat(starts[:1], n_pad, axis=0)], axis=0)

    # f16 transfer: the normalized CT is well inside f16 range; _run_windows
    # upcasts on device. Halves the dominant H2D payload (67→33 MB at 256³).
    probs = _run_windows(
        apply_fn,
        params,
        jnp.asarray(np.asarray(volume, np.float16)[..., None]),
        jnp.asarray(starts),
        jnp.asarray(valid),
        window,
        batch,
        num_classes,
        blend=blend,
    )
    if any(pad):
        probs = probs[: orig_shape[0], : orig_shape[1], : orig_shape[2]]
    return probs


def sliding_window_inference(
    apply_fn: Callable,
    params,
    volume: np.ndarray,
    num_classes: int,
    window: Sequence[int] = (128, 128, 128),
    overlap: float = 0.5,
    batch: int = 8,
    organ_mask: Optional[np.ndarray] = None,
    blend: str = "uniform",
    out_dtype=np.float16,
) -> np.ndarray:
    """Blended sigmoid probabilities (D, H, W, C) for one volume, on host.

    `apply_fn(params, windows)` maps (K, *window, 1) → (K, *window, C) logits.
    `volume`: (D, H, W) float32. `organ_mask`: optional (D, H, W) binary —
    windows with zero overlap are skipped (their region stays probability 0),
    the reference's pancreas-mask window gating. `blend`: 'uniform' (the
    reference's hit-count average, inference3d.py:63-103) or 'gaussian'
    (nnU-Net-style centre-weighted importance). `out_dtype`: dtype of the
    device→host transfer — float16 halves the (D,H,W,C) probability volume's
    transfer cost at negligible precision loss for [0,1] probabilities.
    """
    probs = sliding_window_probs_device(
        apply_fn, params, volume, num_classes, window=window, overlap=overlap,
        batch=batch, organ_mask=organ_mask, blend=blend,
    )
    return np.asarray(probs.astype(jnp.dtype(out_dtype)))
