"""UNETR (flax.linen, channels-last).

Functional equivalent of the reference's MONAI-based
``rsuper_train/model/dim3/unetr.py`` (Hatamizadeh et al. 2021): a ViT encoder
over 16³ patches; hidden states from 4 depths are reshaped to volumes and
progressively deconvolved; a residual-conv decoder merges them U-Net style.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import BasicBlock, TransformerBlock

Dtype = Any
PATCH = 16


class _DeconvBlock(nn.Module):
    features: int
    n_ups: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for _ in range(self.n_ups):
            x = nn.ConvTranspose(self.features, (2, 2, 2), strides=(2, 2, 2),
                                 dtype=self.dtype, param_dtype=jnp.float32)(x)
            x = BasicBlock(self.features, norm="in", dtype=self.dtype)(x)
        return x


class _UpBlock(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        x = nn.ConvTranspose(self.features, (2, 2, 2), strides=(2, 2, 2),
                             dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        return BasicBlock(self.features, norm="in", dtype=self.dtype)(x)


class UNETR(nn.Module):
    num_classes: int
    img_size: Tuple[int, int, int] = (96, 96, 96)
    feature_size: int = 16
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    num_layers: int = 12
    extract_layers: Sequence[int] = ()  # default: quarters of num_layers
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, D, H, W, _ = x.shape
        x = x.astype(self.dtype)
        gd, gh, gw = D // PATCH, H // PATCH, W // PATCH
        n_tokens = gd * gh * gw

        # patch embedding (16^3 conv) + learned positions
        tok = nn.Conv(self.hidden_size, (PATCH,) * 3, strides=(PATCH,) * 3,
                      dtype=self.dtype, param_dtype=jnp.float32)(x)
        tok = tok.reshape(B, n_tokens, self.hidden_size)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, n_tokens, self.hidden_size), jnp.float32)
        tok = tok + pos.astype(tok.dtype)

        extract = tuple(self.extract_layers) or tuple(
            self.num_layers // 4 * k for k in (1, 2, 3, 4)
        )
        hidden = []
        for i in range(self.num_layers):
            tok = TransformerBlock(1, self.num_heads,
                                   self.hidden_size // self.num_heads,
                                   self.mlp_dim, dtype=self.dtype)(tok)
            if (i + 1) in extract:
                hidden.append(tok.reshape(B, gd, gh, gw, self.hidden_size))

        f = self.feature_size
        enc0 = BasicBlock(f, norm="in", dtype=self.dtype)(x)
        enc1 = _DeconvBlock(2 * f, 3, dtype=self.dtype)(hidden[0])
        enc2 = _DeconvBlock(4 * f, 2, dtype=self.dtype)(hidden[1])
        enc3 = _DeconvBlock(8 * f, 1, dtype=self.dtype)(hidden[2])

        out = _UpBlock(8 * f, dtype=self.dtype)(hidden[3], enc3)
        out = _UpBlock(4 * f, dtype=self.dtype)(out, enc2)
        out = _UpBlock(2 * f, dtype=self.dtype)(out, enc1)
        out = _UpBlock(f, dtype=self.dtype)(out, enc0)
        logits = nn.Conv(self.num_classes, (1, 1, 1), dtype=jnp.float32,
                         param_dtype=jnp.float32, name="outc")(out)
        return {"segmentation": logits}
