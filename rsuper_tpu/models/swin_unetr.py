"""SwinUNETR (flax.linen, channels-last).

Functional equivalent of the reference's MONAI-derived
``rsuper_train/model/dim3/swin_unetr.py`` (Hatamizadeh et al. 2022): a 3D
Swin-Transformer encoder — windowed multi-head self-attention with shifted
windows, relative position bias, patch-merging downsampling — feeding a
UNETR-style residual-conv decoder with skip connections from every stage.

TPU notes: window attention reshapes to (num_windows·B, ws³, C) — dense
batched matmuls on the MXU; the shifted-window attention mask is precomputed
per stage resolution (static shapes); cyclic shifts are `jnp.roll`.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import BasicBlock, Mlp

Dtype = Any


def _window_partition(x, ws: int):
    """(B, D, H, W, C) -> (B*nw, ws^3, C)."""
    B, D, H, W, C = x.shape
    x = x.reshape(B, D // ws, ws, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, ws**3, C)


def _window_reverse(wins, ws: int, shape):
    B, D, H, W, C = shape
    x = wins.reshape(B, D // ws, H // ws, W // ws, ws, ws, ws, C)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(B, D, H, W, C)


def _shift_mask(dims: Tuple[int, int, int], ws: int, shift: int) -> np.ndarray:
    """Attention mask for shifted windows: pairs from different pre-shift
    regions must not attend (standard Swin construction). Returns
    (nw, ws^3, ws^3) additive mask with 0 / -inf-ish values."""
    D, H, W = dims
    img = np.zeros((1, D, H, W, 1), np.float32)
    cnt = 0
    slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    for d in slices:
        for h in slices:
            for w in slices:
                img[:, d, h, w, :] = cnt
                cnt += 1
    wins = np.reshape(
        img.reshape(1, D // ws, ws, H // ws, ws, W // ws, ws, 1)
        .transpose(0, 1, 3, 5, 2, 4, 6, 7),
        (-1, ws**3),
    )
    diff = wins[:, :, None] - wins[:, None, :]
    return np.where(diff != 0, -1e9, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    heads: int
    ws: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        """x: (nwB, ws^3, C); mask: (nw, ws^3, ws^3) or None."""
        nwB, L, C = x.shape
        head_dim = self.dim // self.heads
        qkv = nn.Dense(self.dim * 3, use_bias=True, dtype=self.dtype,
                       param_dtype=jnp.float32)(x)
        qkv = qkv.reshape(nwB, L, 3, self.heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        attn = jnp.einsum("bhid,bhjd->bhij", q, k) * (head_dim**-0.5)

        # relative position bias over the 3D window
        ws = self.ws
        n_rel = (2 * ws - 1) ** 3
        table = self.param("rel_bias", nn.initializers.normal(0.02),
                           (n_rel, self.heads), jnp.float32)
        coords = np.stack(np.meshgrid(*([np.arange(ws)] * 3), indexing="ij"))
        coords = coords.reshape(3, -1)
        rel = coords[:, :, None] - coords[:, None, :] + (ws - 1)
        idx = (rel[0] * (2 * ws - 1) + rel[1]) * (2 * ws - 1) + rel[2]
        bias = table[idx.reshape(-1)].reshape(L, L, self.heads)
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(nwB // nw, nw, self.heads, L, L)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(nwB, self.heads, L, L)

        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(nwB, L, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32)(out)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    ws: int
    shift: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        shortcut = x
        h = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
        if self.shift > 0:
            h = jnp.roll(h, (-self.shift,) * 3, axis=(1, 2, 3))
            mask = jnp.asarray(_shift_mask((D, H, W), self.ws, self.shift))
        else:
            mask = None
        wins = _window_partition(h, self.ws)
        wins = WindowAttention(self.dim, self.heads, self.ws,
                               dtype=self.dtype)(wins, mask)
        h = _window_reverse(wins, self.ws, (B, D, H, W, C))
        if self.shift > 0:
            h = jnp.roll(h, (self.shift,) * 3, axis=(1, 2, 3))
        x = shortcut + h
        h = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
        return x + Mlp(int(self.dim * self.mlp_ratio), dtype=self.dtype)(h)


class SwinPatchMerging(nn.Module):
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        x = x.reshape(B, D // 2, 2, H // 2, 2, W // 2, 2, C)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(B, D // 2, H // 2, W // 2, 8 * C)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
        return nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32)(x)


class _DecoderUp(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        x = nn.ConvTranspose(self.features, (2, 2, 2), strides=(2, 2, 2),
                             dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        return BasicBlock(self.features, norm="in", dtype=self.dtype)(x)


class SwinUNETR(nn.Module):
    num_classes: int
    feature_size: int = 48
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.feature_size
        x = x.astype(self.dtype)

        # patch embedding: stride-2 conv (SwinUNETR patch size 2)
        t = nn.Conv(f, (2, 2, 2), strides=(2, 2, 2), dtype=self.dtype,
                    param_dtype=jnp.float32)(x)

        stage_feats = []
        dims = [f, 2 * f, 4 * f, 8 * f]
        for s in range(4):
            for b in range(self.depths[s]):
                shift = 0 if b % 2 == 0 else self.window_size // 2
                t = SwinBlock(dims[s], self.num_heads[s], self.window_size,
                              shift, dtype=self.dtype)(t)
            stage_feats.append(t)
            if s < 3:
                t = SwinPatchMerging(dims[s + 1], dtype=self.dtype)(t)

        enc0 = BasicBlock(f, norm="in", dtype=self.dtype)(x)
        enc1 = BasicBlock(f, norm="in", dtype=self.dtype)(stage_feats[0])
        enc2 = BasicBlock(2 * f, norm="in", dtype=self.dtype)(stage_feats[1])
        enc3 = BasicBlock(4 * f, norm="in", dtype=self.dtype)(stage_feats[2])
        bottleneck = BasicBlock(8 * f, norm="in", dtype=self.dtype)(stage_feats[3])

        out = _DecoderUp(4 * f, dtype=self.dtype)(bottleneck, enc3)
        out = _DecoderUp(2 * f, dtype=self.dtype)(out, enc2)
        out = _DecoderUp(f, dtype=self.dtype)(out, enc1)
        out = _DecoderUp(f, dtype=self.dtype)(out, enc0)
        logits = nn.Conv(self.num_classes, (1, 1, 1), dtype=jnp.float32,
                         param_dtype=jnp.float32, name="outc")(out)
        return {"segmentation": logits}
