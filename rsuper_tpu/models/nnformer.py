"""nnFormer and VT-UNet (flax.linen, channels-last, compact).

Functional equivalents of the reference's
``rsuper_train/model/dim3/nnformer.py`` (Zhou et al. 2021: interleaved
convolution + local-volume MSA encoder, transformer decoder, deep
supervision) and ``vtunet.py`` (Peiris et al. 2022: Swin encoder + pure
transformer decoder with patch-expanding upsampling).

Both reuse the 3D shifted-window attention machinery from `swin_unetr` —
local volume-based MSA and shifted-window MSA are the same computation; the
architectural identity (conv stem vs linear embed, decoder style, deep
supervision) is what distinguishes the families.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvNormAct, resize_trilinear
from .swin_unetr import SwinBlock, SwinPatchMerging

Dtype = Any


class _PatchExpand(nn.Module):
    """Linear 2x upsampling: project to 8*C' then depth-to-space."""

    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        x = nn.Dense(8 * self.out_dim, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32)(x)
        x = x.reshape(B, D, H, W, 2, 2, 2, self.out_dim)
        x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        return x.reshape(B, 2 * D, 2 * H, 2 * W, self.out_dim)


class NnFormer(nn.Module):
    """Conv stem → [LV-MSA blocks + merge]×3 stages → transformer decoder with
    additive skips and deep supervision (nnFormer encoder/decoder layout)."""

    num_classes: int
    embed_dim: int = 48
    depths: Sequence[int] = (2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12)
    window_size: int = 4
    aux_loss: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        e = self.embed_dim
        x = x.astype(self.dtype)
        # conv embedding: two stride-2 conv blocks (4x downsample)
        t = ConvNormAct(e // 2, 3, strides=2, norm="in", act="gelu",
                        dtype=self.dtype)(x)
        t = ConvNormAct(e, 3, strides=2, norm="in", act="gelu",
                        dtype=self.dtype)(t)

        dims = [e, 2 * e, 4 * e]
        skips = []
        for s in range(3):
            for b in range(self.depths[s]):
                shift = 0 if b % 2 == 0 else self.window_size // 2
                t = SwinBlock(dims[s], self.num_heads[s], self.window_size,
                              shift, dtype=self.dtype)(t)
            skips.append(t)
            if s < 2:
                t = SwinPatchMerging(dims[s + 1], dtype=self.dtype)(t)

        # transformer decoder with additive skips
        out = skips[-1]
        aux = None
        for s in (1, 0):
            out = _PatchExpand(dims[s], dtype=self.dtype)(out)
            out = out + skips[s]
            for b in range(self.depths[s]):
                shift = 0 if b % 2 == 0 else self.window_size // 2
                out = SwinBlock(dims[s], self.num_heads[s], self.window_size,
                                shift, dtype=self.dtype)(out)
            if self.aux_loss and s == 1:
                a = nn.Conv(self.num_classes, (1, 1, 1), dtype=jnp.float32,
                            param_dtype=jnp.float32, name="aux_out")(out)
                aux = resize_trilinear(a, x.shape[1:4]).astype(jnp.float32)

        # back to full resolution (4x) with two expand steps
        out = _PatchExpand(e // 2, dtype=self.dtype)(out)
        out = _PatchExpand(e // 2, dtype=self.dtype)(out)
        logits = nn.Conv(self.num_classes, (1, 1, 1), dtype=jnp.float32,
                         param_dtype=jnp.float32, name="outc")(out)
        if self.aux_loss:
            return {"segmentation": [logits, aux]}
        return {"segmentation": logits}


class VTUNet(nn.Module):
    """Swin encoder + pure transformer decoder with patch expanding and
    skip concatenation (VT-UNet layout)."""

    num_classes: int
    embed_dim: int = 48
    depths: Sequence[int] = (2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12)
    window_size: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        e = self.embed_dim
        x = x.astype(self.dtype)
        # linear patch embedding (2^3 patches)
        t = nn.Conv(e, (2, 2, 2), strides=(2, 2, 2), dtype=self.dtype,
                    param_dtype=jnp.float32)(x)

        dims = [e, 2 * e, 4 * e]
        skips = []
        for s in range(3):
            for b in range(self.depths[s]):
                shift = 0 if b % 2 == 0 else self.window_size // 2
                t = SwinBlock(dims[s], self.num_heads[s], self.window_size,
                              shift, dtype=self.dtype)(t)
            skips.append(t)
            if s < 2:
                t = SwinPatchMerging(dims[s + 1], dtype=self.dtype)(t)

        out = skips[-1]
        for s in (1, 0):
            out = _PatchExpand(dims[s], dtype=self.dtype)(out)
            out = nn.Dense(dims[s], use_bias=False, dtype=self.dtype,
                           param_dtype=jnp.float32)(
                jnp.concatenate([out, skips[s]], axis=-1)
            )
            for b in range(self.depths[s]):
                shift = 0 if b % 2 == 0 else self.window_size // 2
                out = SwinBlock(dims[s], self.num_heads[s], self.window_size,
                                shift, dtype=self.dtype)(out)

        out = _PatchExpand(e, dtype=self.dtype)(out)
        logits = nn.Conv(self.num_classes, (1, 1, 1), dtype=jnp.float32,
                         param_dtype=jnp.float32, name="outc")(out)
        return {"segmentation": logits}
