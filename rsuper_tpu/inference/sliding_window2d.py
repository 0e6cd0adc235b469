"""2D sliding-window inference (slice-based models).

Counterpart of the reference's ``rsuper_train/inference/inference2d.py``:
run a 2D model over each z-slice of a volume, with in-plane half-overlap
windows when the slice is larger than the window. Slices are batched — the
TPU sees (K, H, W, 1) stacks, not single slices.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .sliding_window import window_starts


def sliding_window_inference_2d(
    apply_fn: Callable,
    params,
    volume: np.ndarray,
    num_classes: int,
    window: Sequence[int] = (256, 256),
    overlap: float = 0.5,
    batch: int = 8,
) -> np.ndarray:
    """Blended sigmoid probabilities (D, H, W, C); `apply_fn(params, x)` maps
    (K, h, w, 1) → (K, h, w, C) logits."""
    D, H, W = volume.shape
    window = tuple(window)
    pad = [max(0, w - s) for s, w in zip((H, W), window)]
    vol = np.pad(volume, [(0, 0), (0, pad[0]), (0, pad[1])]) if any(pad) else volume
    Hp, Wp = vol.shape[1:]
    stride = tuple(max(1, int(w * (1 - overlap))) for w in window)
    ys = window_starts(Hp, window[0], stride[0])
    xs = window_starts(Wp, window[1], stride[1])

    tiles = []
    coords = []
    for z in range(D):
        for y in ys:
            for x in xs:
                tiles.append(vol[z, y : y + window[0], x : x + window[1]])
                coords.append((z, y, x))
    tiles = np.asarray(tiles, np.float32)[..., None]
    n = len(tiles)
    n_pad = (-n) % batch
    if n_pad:
        tiles = np.concatenate([tiles, np.zeros((n_pad, *window, 1), np.float32)])

    fn = jax.jit(lambda p, t: jax.nn.sigmoid(apply_fn(p, t).astype(jnp.float32)))
    probs = np.zeros((D, Hp, Wp, num_classes), np.float32)
    cnt = np.zeros((D, Hp, Wp, 1), np.float32)
    out_chunks = []
    for i in range(0, len(tiles), batch):
        out_chunks.append(np.asarray(fn(params, jnp.asarray(tiles[i : i + batch]))))
    out = np.concatenate(out_chunks)[:n]
    for (z, y, x), p in zip(coords, out):
        probs[z, y : y + window[0], x : x + window[1]] += p
        cnt[z, y : y + window[0], x : x + window[1]] += 1.0
    probs /= np.maximum(cnt, 1.0)
    return probs[:, :H, :W]
