"""2D transformer model zoo: Swin-UNet, UNet++ 2D, MedFormer 2D.

Functional equivalents of the reference's ``rsuper_train/model/dim2/
swin_unet.py`` (Cao et al. 2021 Swin-Unet: pure Swin encoder/decoder with
patch-expanding upsampling), ``dim2/unetpp.py`` (nested dense skips) and
``dim2/medformer.py`` (bidirectional feature↔semantic-map attention, 8×8
map). Completes the 2D pathway's architecture parity (docs/parity.md).

TPU notes: window attention is dense batched matmuls over (nw·B, ws², C)
tokens; shift masks and relative-bias index tables are precomputed numpy
constants (static shapes); patch merge/expand are reshapes + Dense — all
MXU-friendly. Channels-last NHWC throughout.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .dim2 import BasicBlock2D, ConvNormAct2D, _resize2d
from .layers import Mlp, TransformerBlock, instance_norm, make_act

Dtype = Any


# --------------------------------------------------------------- 2D windows
def _window_partition2d(x, ws: int):
    """(B, H, W, C) -> (B·nw, ws², C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def _window_reverse2d(wins, ws: int, shape):
    B, H, W, C = shape
    x = wins.reshape(B, H // ws, W // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def _shift_mask2d(dims, ws: int, shift: int) -> np.ndarray:
    """(nw, ws², ws²) additive attention mask for shifted 2D windows."""
    H, W = dims
    img = np.zeros((1, H, W, 1), np.float32)
    cnt = 0
    slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    for h in slices:
        for w in slices:
            img[:, h, w, :] = cnt
            cnt += 1
    wins = np.reshape(
        img.reshape(1, H // ws, ws, W // ws, ws, 1).transpose(0, 1, 3, 2, 4, 5),
        (-1, ws * ws),
    )
    diff = wins[:, :, None] - wins[:, None, :]
    return np.where(diff != 0, -1e9, 0.0).astype(np.float32)


class WindowAttention2D(nn.Module):
    dim: int
    heads: int
    ws: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        nwB, L, _ = x.shape
        head_dim = self.dim // self.heads
        qkv = nn.Dense(self.dim * 3, use_bias=True, dtype=self.dtype,
                       param_dtype=jnp.float32)(x)
        qkv = qkv.reshape(nwB, L, 3, self.heads, head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhid,bhjd->bhij", q, k) * (head_dim**-0.5)

        ws = self.ws
        table = self.param("rel_bias", nn.initializers.normal(0.02),
                           ((2 * ws - 1) ** 2, self.heads), jnp.float32)
        coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                      indexing="ij")).reshape(2, -1)
        rel = coords[:, :, None] - coords[:, None, :] + (ws - 1)
        idx = rel[0] * (2 * ws - 1) + rel[1]
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


class SwinBlock2D(nn.Module):
    dim: int
    heads: int
    ws: int
    shift: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        ws = min(self.ws, H, W)
        shift = self.shift if ws > self.shift else 0
        shortcut = x
        h = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
        if shift > 0:
            h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_mask2d((H, W), ws, shift))
        else:
            mask = None
        wins = _window_partition2d(h, ws)
        wins = WindowAttention2D(self.dim, self.heads, ws,
                                 dtype=self.dtype)(wins, mask)
        h = _window_reverse2d(wins, ws, (B, H, W, C))
        if shift > 0:
            h = jnp.roll(h, (shift, shift), axis=(1, 2))
        x = shortcut + h
        h = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
        return x + Mlp(int(self.dim * self.mlp_ratio), dtype=self.dtype)(h)


class PatchMerging2D(nn.Module):
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
        return nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32)(x)


class PatchExpand2D(nn.Module):
    """2× upsample by Dense → pixel-shuffle (Swin-Unet PatchExpand)."""

    out_dim: int
    factor: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        f = self.factor
        x = nn.Dense(self.out_dim * f * f, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32)(x)
        x = x.reshape(B, H, W, f, f, self.out_dim)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * f, W * f, self.out_dim)
        return nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)


class SwinUNet2D(nn.Module):
    """Pure-transformer U-shape: patch-embed 4×4 → Swin encoder with patch
    merging → mirrored Swin decoder with patch expanding + linear skip
    concat → 4× final expand → 1×1 head (reference ``dim2/swin_unet.py``
    SwinTransformerSys :1146)."""

    num_classes: int
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 4
    patch_size: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        ps = self.patch_size
        t = nn.Conv(self.embed_dim, (ps, ps), strides=(ps, ps),
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        t = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(t)

        n = len(self.depths)
        dims = [self.embed_dim * (2**i) for i in range(n)]
        skips = []
        for s in range(n):
            for b in range(self.depths[s]):
                shift = 0 if b % 2 == 0 else self.window_size // 2
                t = SwinBlock2D(dims[s], self.num_heads[s], self.window_size,
                                shift, dtype=self.dtype)(t)
            skips.append(t)
            if s < n - 1:
                t = PatchMerging2D(dims[s + 1], dtype=self.dtype)(t)

        for s in range(n - 2, -1, -1):
            t = PatchExpand2D(dims[s], dtype=self.dtype)(t)
            t = jnp.concatenate([t, skips[s]], axis=-1)
            t = nn.Dense(dims[s], use_bias=False, dtype=self.dtype,
                         param_dtype=jnp.float32)(t)
            for b in range(self.depths[s]):
                shift = 0 if b % 2 == 0 else self.window_size // 2
                t = SwinBlock2D(dims[s], self.num_heads[s], self.window_size,
                                shift, dtype=self.dtype)(t)

        t = PatchExpand2D(self.embed_dim, factor=ps, dtype=self.dtype)(t)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                         param_dtype=jnp.float32, name="outc")(t)
        return {"segmentation": logits}


# ------------------------------------------------------------------ UNet++ 2D
class _PPBlock2D(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvNormAct2D(self.features, dtype=self.dtype)(x)
        return ConvNormAct2D(self.features, dtype=self.dtype)(x)


class UNetPlusPlus2D(nn.Module):
    """Nested dense skip pathways X^{i,j} (reference ``dim2/unetpp.py``)."""

    num_classes: int
    base_chan: int = 32
    depth: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = self.base_chan
        x = x.astype(self.dtype)
        chans = [b * (2**i) for i in range(self.depth + 1)]
        grid = {}
        h = x
        for i in range(self.depth + 1):
            if i > 0:
                h = nn.max_pool(grid[(i - 1, 0)], (2, 2), (2, 2))
            grid[(i, 0)] = _PPBlock2D(chans[i], dtype=self.dtype,
                                      name=f"x{i}_0")(h)
        for j in range(1, self.depth + 1):
            for i in range(self.depth + 1 - j):
                up = _resize2d(grid[(i + 1, j - 1)],
                               grid[(i, 0)].shape[1:3]).astype(self.dtype)
                cat = jnp.concatenate(
                    [grid[(i, k)] for k in range(j)] + [up], axis=-1
                )
                grid[(i, j)] = _PPBlock2D(chans[i], dtype=self.dtype,
                                          name=f"x{i}_{j}")(cat)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                         param_dtype=jnp.float32,
                         name="outc")(grid[(0, self.depth)])
        return {"segmentation": logits}


# --------------------------------------------------------------- MedFormer 2D
class SemanticMapGeneration2D(nn.Module):
    """Pool features into an (ms × ms) semantic map via learned spatial
    attention (2D mirror of ``medformer.SemanticMapGeneration``; reference
    ``dim2/medformer_utils`` map_size 8)."""

    map_dim: int
    map_size: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        code = self.map_size * self.map_size
        feat = nn.Conv(self.map_dim, (3, 3), padding="SAME", use_bias=False,
                       dtype=self.dtype, param_dtype=jnp.float32)(x)
        weight = nn.Conv(code, (3, 3), padding="SAME", use_bias=False,
                         dtype=self.dtype, param_dtype=jnp.float32)(x)
        feat = feat.reshape(b, -1, self.map_dim)
        weight = weight.reshape(b, -1, code)
        weight = jax.nn.softmax(weight.astype(jnp.float32), axis=1).astype(x.dtype)
        sem = jnp.einsum("bsm,bsk->bkm", feat, weight)
        return sem.reshape(b, self.map_size, self.map_size, self.map_dim)


class BidirectionAttention2D(nn.Module):
    map_dim: int
    out_dim: int
    heads: int
    dim_head: int
    map_size: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, sem):
        b, h, w, _ = feat.shape
        inner = self.heads * self.dim_head
        feat_qv = nn.Conv(inner * 2, (1, 1), use_bias=False, dtype=self.dtype,
                          param_dtype=jnp.float32)(feat)
        map_qv = nn.Conv(inner * 2, (1, 1), use_bias=False, dtype=self.dtype,
                         param_dtype=jnp.float32)(sem)

        def tokens(t):
            t = t.reshape(b, -1, 2, self.heads, self.dim_head)
            t = t.transpose(2, 0, 3, 1, 4)
            return t[0], t[1]

        fq, fv = tokens(feat_qv)
        mq, mv = tokens(map_qv)
        attn = jnp.einsum("bhid,bhjd->bhij", fq, mq) * (self.dim_head**-0.5)
        a32 = attn.astype(jnp.float32)
        f2m = jax.nn.softmax(a32, axis=-1).astype(feat.dtype)
        m2f = jax.nn.softmax(a32, axis=-2).astype(feat.dtype)
        feat_out = jnp.einsum("bhij,bhjd->bhid", f2m, mv)
        feat_out = feat_out.transpose(0, 2, 1, 3).reshape(b, h, w, inner)
        map_out = jnp.einsum("bhji,bhjd->bhid", m2f, fv)
        map_out = map_out.transpose(0, 2, 1, 3).reshape(
            b, self.map_size, self.map_size, inner
        )
        feat_out = nn.Conv(self.out_dim, (1, 1), use_bias=False,
                           dtype=self.dtype, param_dtype=jnp.float32)(feat_out)
        map_out = nn.Conv(self.map_dim, (1, 1), use_bias=False,
                          dtype=self.dtype, param_dtype=jnp.float32)(map_out)
        return feat_out, map_out


class BidirectionAttentionBlock2D(nn.Module):
    map_dim: int
    out_dim: int
    heads: int
    dim_head: int
    expansion: int = 4
    map_size: int = 8
    act: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sem):
        feat = instance_norm(x)
        mapp = instance_norm(sem)
        out, map_out = BidirectionAttention2D(
            self.map_dim, self.out_dim, self.heads, self.dim_head,
            map_size=self.map_size, dtype=self.dtype,
        )(feat, mapp)
        shortcut = x
        if x.shape[-1] != self.out_dim:
            shortcut = ConvNormAct2D(self.out_dim, kernel=1,
                                     dtype=self.dtype)(x)
        out = out + shortcut
        # feed-forward: expand 1×1 → depthwise 3×3 → project (MBConv-style)
        ff_in = out
        expanded = self.expansion * self.out_dim
        h = ConvNormAct2D(expanded, kernel=1, dtype=self.dtype)(out)
        h = nn.Conv(expanded, (3, 3), padding="SAME",
                    feature_group_count=expanded, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = make_act(self.act)(instance_norm(h))
        h = nn.Conv(self.out_dim, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(h)
        return ff_in + h, map_out + sem


class DownBlockMF2D(nn.Module):
    out_dim: int
    conv_num: int
    trans_num: int
    heads: int = 4
    dim_head: int = 64
    map_size: int = 8
    map_generate: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.max_pool(x, (2, 2), (2, 2))
        for _ in range(self.conv_num):
            x = BasicBlock2D(self.out_dim, dtype=self.dtype)(x)
        if x.shape[-1] != self.out_dim and self.conv_num == 0:
            x = ConvNormAct2D(self.out_dim, kernel=1, dtype=self.dtype)(x)
        sem = None
        if self.map_generate:
            sem = SemanticMapGeneration2D(self.out_dim, self.map_size,
                                          dtype=self.dtype)(x)
        for _ in range(self.trans_num):
            x, sem = BidirectionAttentionBlock2D(
                self.out_dim, self.out_dim, self.heads, self.dim_head,
                map_size=self.map_size, dtype=self.dtype,
            )(x, sem)
        return x, sem


class UpBlockMF2D(nn.Module):
    out_dim: int
    conv_num: int
    trans_num: int
    heads: int = 4
    dim_head: int = 64
    map_size: int = 8
    map_shortcut: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_low, x_skip, map_low, map_skip=None):
        x = _resize2d(x_low, x_skip.shape[1:3]).astype(x_low.dtype)
        feat = jnp.concatenate([x, x_skip.astype(x.dtype)], axis=-1)
        feat = ConvNormAct2D(self.out_dim, kernel=1, dtype=self.dtype)(feat)
        if self.map_shortcut and map_skip is not None:
            sem = jnp.concatenate([map_low, map_skip], axis=-1)
            sem = nn.Conv(self.out_dim, (1, 1), use_bias=False,
                          dtype=self.dtype, param_dtype=jnp.float32)(sem)
        else:
            sem = map_low
        for _ in range(self.trans_num):
            feat, sem = BidirectionAttentionBlock2D(
                self.out_dim, self.out_dim, self.heads, self.dim_head,
                map_size=self.map_size, dtype=self.dtype,
            )(feat, sem)
        for _ in range(self.conv_num):
            feat = BasicBlock2D(self.out_dim, dtype=self.dtype)(feat)
        return feat, sem


class SemanticMapFusion2D(nn.Module):
    dim: int
    heads: int
    depth: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, maps):
        b = maps[0].shape[0]
        in_dims = [m.shape[-1] for m in maps]
        toks = []
        for i, m in enumerate(maps):
            t = nn.Conv(self.dim, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"in_proj{i}")(m)
            toks.append(t.reshape(b, -1, self.dim))
        lens = [t.shape[1] for t in toks]
        fused = TransformerBlock(self.depth, self.heads, self.dim // self.heads,
                                 self.dim, dtype=self.dtype)(
            jnp.concatenate(toks, axis=1)
        )
        outs = []
        start = 0
        for i, m in enumerate(maps):
            seg = fused[:, start : start + lens[i]]
            start += lens[i]
            seg = seg.reshape(b, *m.shape[1:3], self.dim)
            outs.append(
                nn.Conv(in_dims[i], (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"out_proj{i}")(seg)
            )
        return outs


class MedFormer2D(nn.Module):
    """2D MedFormer (reference ``dim2/medformer.py:10``): conv stem + down1,
    B-MHA on down2-4 / up1-2, conv decoder up3-4, 8×8 semantic maps with
    cross-scale fusion, optional aux head."""

    num_classes: int
    base_chan: int = 32
    map_size: int = 8
    conv_num: Sequence[int] = (2, 1, 0, 0, 0, 1, 2, 2)
    trans_num: Sequence[int] = (0, 1, 2, 2, 2, 1, 0, 0)
    num_heads: Sequence[int] = (1, 4, 8, 16, 8, 4, 1, 1)
    fusion_depth: int = 2
    fusion_dim: int = 512
    fusion_heads: int = 16
    aux_loss: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = self.base_chan
        ch = (2 * b, 4 * b, 8 * b, 16 * b, 8 * b, 4 * b, 2 * b, b)
        dim_head = [ch[i] // self.num_heads[i] for i in range(8)]
        x = x.astype(self.dtype)

        x0 = nn.Conv(b, (3, 3), padding="SAME", use_bias=False,
                     dtype=self.dtype, param_dtype=jnp.float32)(x)
        x0 = BasicBlock2D(b, dtype=self.dtype)(x0)

        def down(i, inp, map_generate):
            return DownBlockMF2D(
                ch[i], self.conv_num[i], self.trans_num[i],
                heads=self.num_heads[i], dim_head=dim_head[i],
                map_size=self.map_size, map_generate=map_generate,
                dtype=self.dtype,
            )(inp)

        x1, _ = down(0, x0, False)
        x2, map2 = down(1, x1, True)
        x3, map3 = down(2, x2, True)
        x4, map4 = down(3, x3, True)

        map2, map3, map4 = SemanticMapFusion2D(
            self.fusion_dim, self.fusion_heads, depth=self.fusion_depth,
            dtype=self.dtype,
        )([map2, map3, map4])

        def up(i, a, skip, m1, m2, map_shortcut):
            return UpBlockMF2D(
                ch[i], self.conv_num[i], self.trans_num[i],
                heads=self.num_heads[i], dim_head=dim_head[i],
                map_size=self.map_size, map_shortcut=map_shortcut,
                dtype=self.dtype,
            )(a, skip, m1, m2)

        out, sem = up(4, x4, x3, map4, map3, True)
        out, sem = up(5, out, x2, sem, map2, True)
        aux = None
        if self.aux_loss:
            a = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="aux_out")(out)
            aux = _resize2d(a, x.shape[1:3])
        out, sem = up(6, out, x1, sem, None, False)
        out, sem = up(7, out, x0, sem, None, False)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                         param_dtype=jnp.float32, name="outc")(out)
        return {"segmentation": [logits, aux] if self.aux_loss else logits}
