"""Attention U-Net (flax.linen, channels-last).

Functional equivalent of the reference's
``rsuper_train/model/dim3/attention_unet.py`` (Oktay et al. 2018): a UNet
whose skip connections pass through additive attention gates driven by the
coarser decoder feature.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvNormAct, resize_trilinear

Dtype = Any


class AttentionGate(nn.Module):
    inter: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, g, x):
        """g: gating (decoder, coarser); x: skip feature. Returns gated x."""
        gi = nn.Conv(self.inter, (1, 1, 1), dtype=self.dtype,
                     param_dtype=jnp.float32)(g)
        xi = nn.Conv(self.inter, (1, 1, 1), dtype=self.dtype,
                     param_dtype=jnp.float32)(x)
        a = nn.relu(gi + xi)
        a = nn.Conv(1, (1, 1, 1), dtype=self.dtype, param_dtype=jnp.float32)(a)
        return x * jax.nn.sigmoid(a.astype(jnp.float32)).astype(x.dtype)


class _Double(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvNormAct(self.features, 3, norm="in", act="relu", dtype=self.dtype)(x)
        return ConvNormAct(self.features, 3, norm="in", act="relu", dtype=self.dtype)(x)


class AttentionUNet(nn.Module):
    num_classes: int
    base_chan: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = self.base_chan
        x = x.astype(self.dtype)
        e1 = _Double(b, dtype=self.dtype)(x)
        e2 = _Double(2 * b, dtype=self.dtype)(nn.max_pool(e1, (2,) * 3, (2,) * 3))
        e3 = _Double(4 * b, dtype=self.dtype)(nn.max_pool(e2, (2,) * 3, (2,) * 3))
        e4 = _Double(8 * b, dtype=self.dtype)(nn.max_pool(e3, (2,) * 3, (2,) * 3))
        e5 = _Double(10 * b, dtype=self.dtype)(nn.max_pool(e4, (2,) * 3, (2,) * 3))

        out = e5
        for skip, c in ((e4, 8 * b), (e3, 4 * b), (e2, 2 * b), (e1, b)):
            out = resize_trilinear(out, skip.shape[1:4]).astype(out.dtype)
            gated = AttentionGate(max(c // 2, 1), dtype=self.dtype)(out, skip)
            out = _Double(c, dtype=self.dtype)(
                jnp.concatenate([out, gated], axis=-1)
            )
        logits = nn.Conv(self.num_classes, (1, 1, 1), dtype=jnp.float32,
                         param_dtype=jnp.float32, name="outc")(out)
        return {"segmentation": logits}
