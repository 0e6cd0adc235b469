"""Legacy losses kept for API parity with the reference's ``training/losses.py``
(softmax Dice with adaptive Tversky alpha :8, sigmoid multi-label Dice :62,
Focal loss :113). The main R-Super path does not use these.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_dice_loss(logits, target_indices, smooth: float = 1e-5):
    """Adaptive-Tversky Dice over softmax probabilities with integer targets.

    logits: (B, D, H, W, C); target_indices: (B, D, H, W) int. Returns scalar
    (mean over classes), matching ``losses.py:8-60``.
    """
    C = logits.shape[-1]
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    t = jax.nn.one_hot(target_indices, C, dtype=jnp.float32)
    tp = p * t
    fp = p * (1.0 - t)
    fn = (1.0 - p) * t
    red = tuple(range(p.ndim - 1))  # all but class
    fp_c, fn_c, tp_c = (jnp.sum(v, axis=red) for v in (fp, fn, tp))
    alpha = jnp.clip(fp_c / (fp_c + fn_c + smooth), 0.2, 0.8)
    dice = tp_c / (tp_c + alpha * fp_c + (1.0 - alpha) * fn_c + smooth)
    return jnp.mean(1.0 - dice)


def focal_loss(logits, targets, gamma: float = 2.0, alpha: float = 0.25):
    """Binary focal loss on logits (``losses.py:113-173`` semantics)."""
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    t = targets.astype(jnp.float32)
    pt = p * t + (1.0 - p) * (1.0 - t)
    w = alpha * t + (1.0 - alpha) * (1.0 - t)
    loss = -w * (1.0 - pt) ** gamma * jnp.log(jnp.clip(pt, 1e-8, 1.0))
    return jnp.mean(loss)
