"""2D model pathway (flax.linen, channels-last NHWC).

Counterpart of the reference's ``rsuper_train/model/dim2`` mirror set (UNet /
ResUNet / AttentionUNet / TransUNet). The R-Super paper path is 3D; the 2D
models serve slice-based datasets and ablations (``--dimension 2d``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import TransformerBlock, instance_norm, make_act

Dtype = Any


class ConvNormAct2D(nn.Module):
    features: int
    kernel: int = 3
    strides: int = 1
    norm: str = "in"
    act: str = "relu"
    preact: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = nn.Conv(self.features, (self.kernel,) * 2,
                       strides=(self.strides,) * 2, padding="SAME",
                       use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        act = make_act(self.act)
        norm = instance_norm if self.norm == "in" else (lambda v: v)
        if self.preact:
            return conv(act(norm(x)))
        return act(norm(conv(x)))


class BasicBlock2D(nn.Module):
    features: int
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = ConvNormAct2D(self.features, strides=self.strides, dtype=self.dtype)(x)
        h = ConvNormAct2D(self.features, dtype=self.dtype)(h)
        if self.strides != 1 or x.shape[-1] != self.features:
            x = ConvNormAct2D(self.features, strides=self.strides,
                              dtype=self.dtype)(x)
        return h + x


def _resize2d(x, size):
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, *size, c), method="linear")


class UNet2D(nn.Module):
    num_classes: int
    base_chan: int = 32
    block: str = "BasicBlock"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = self.base_chan
        x = x.astype(self.dtype)
        Block = BasicBlock2D
        e1 = Block(b, dtype=self.dtype)(x)
        e2 = Block(2 * b, strides=2, dtype=self.dtype)(e1)
        e3 = Block(4 * b, strides=2, dtype=self.dtype)(e2)
        e4 = Block(8 * b, strides=2, dtype=self.dtype)(e3)
        e5 = Block(10 * b, strides=2, dtype=self.dtype)(e4)
        out = e5
        for skip, c in ((e4, 8 * b), (e3, 4 * b), (e2, 2 * b), (e1, b)):
            out = _resize2d(out, skip.shape[1:3]).astype(self.dtype)
            out = Block(c, dtype=self.dtype)(
                jnp.concatenate([out, skip], axis=-1)
            )
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                         param_dtype=jnp.float32, name="outc")(out)
        return {"segmentation": logits}


class AttentionGate2D(nn.Module):
    inter: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, g, x):
        a = nn.relu(
            nn.Conv(self.inter, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(g)
            + nn.Conv(self.inter, (1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32)(x)
        )
        a = nn.Conv(1, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)(a)
        return x * jax.nn.sigmoid(a.astype(jnp.float32)).astype(x.dtype)


class AttentionUNet2D(nn.Module):
    num_classes: int
    base_chan: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = self.base_chan
        x = x.astype(self.dtype)
        e1 = BasicBlock2D(b, dtype=self.dtype)(x)
        e2 = BasicBlock2D(2 * b, strides=2, dtype=self.dtype)(e1)
        e3 = BasicBlock2D(4 * b, strides=2, dtype=self.dtype)(e2)
        e4 = BasicBlock2D(8 * b, strides=2, dtype=self.dtype)(e3)
        out = e4
        for skip, c in ((e3, 4 * b), (e2, 2 * b), (e1, b)):
            out = _resize2d(out, skip.shape[1:3]).astype(self.dtype)
            gated = AttentionGate2D(max(c // 2, 1), dtype=self.dtype)(out, skip)
            out = BasicBlock2D(c, dtype=self.dtype)(
                jnp.concatenate([out, gated], axis=-1)
            )
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                         param_dtype=jnp.float32, name="outc")(out)
        return {"segmentation": logits}


class PositionAttention2D(nn.Module):
    """DANet position attention (reference ``dim2/dual_attention_utils.py``
    ``PAM_Module`` :75-112): every spatial position attends over all others
    with 1×1-projected q/k (C/8) and full-C values; the attended map is
    blended in through a zero-initialised learnable gate, so the module
    starts as identity. Runs as two batched einsums — MXU-shaped (the
    bottleneck grid is HW ≤ ~1k tokens), softmax in f32."""

    reduction: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        proj = lambda c, n: nn.Conv(c, (1, 1), dtype=self.dtype,
                                    param_dtype=jnp.float32, name=n)
        q = proj(max(C // self.reduction, 1), "query")(x).reshape(B, H * W, -1)
        k = proj(max(C // self.reduction, 1), "key")(x).reshape(B, H * W, -1)
        v = proj(C, "value")(x).reshape(B, H * W, C)
        energy = jnp.einsum("bic,bjc->bij", q, k).astype(jnp.float32)
        attn = jax.nn.softmax(energy, axis=-1).astype(x.dtype)
        out = jnp.einsum("bij,bjc->bic", attn, v).reshape(B, H, W, C)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        return gamma.astype(x.dtype) * out + x


class ChannelAttention2D(nn.Module):
    """DANet channel attention (reference ``CAM_Module`` :115-147): gram
    matrix over channels, sharpened as softmax(rowmax − energy) — the
    reference's exact (inverted-similarity) formulation — then applied to
    the channel vectors; zero-initialised residual gate."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        flat = x.reshape(B, H * W, C)
        energy = jnp.einsum("bnc,bnd->bcd", flat, flat).astype(jnp.float32)
        energy = jnp.max(energy, axis=-1, keepdims=True) - energy
        attn = jax.nn.softmax(energy, axis=-1).astype(x.dtype)
        out = jnp.einsum("bcd,bnd->bnc", attn, flat).reshape(B, H, W, C)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        return gamma.astype(x.dtype) * out + x


class DAHead2D(nn.Module):
    """Dual-attention head (reference ``DAHead`` :7-72): parallel position-
    and channel-attention branches over norm→act→3×3-projected features
    (C → C/4), each re-expanded by a 1×1 conv, summed into the fused map.
    Returns (fused features, fused/position/channel class predictions) —
    the reference's ``DAUNet.forward`` (:39-47) keeps only the fused
    features for the decoder and discards the three predictions; they are
    surfaced here for parity/inspection. The reference's 0.1 dropout before
    each prediction conv is inference-mode (identity) — the train step
    does not thread dropout RNG, matching its eval behaviour."""

    num_classes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        inter = C // 4

        def branch(attn, tag):
            h = ConvNormAct2D(inter, kernel=3, preact=True,
                              dtype=self.dtype, name=f"conv_{tag}")(x)
            h = attn(h)
            return ConvNormAct2D(C, kernel=1, preact=True, dtype=self.dtype,
                                 name=f"conv_{tag}_1")(h)

        sa = branch(PositionAttention2D(dtype=self.dtype, name="sa"), "a")
        sc = branch(ChannelAttention2D(dtype=self.dtype, name="sc"), "c")
        fused = sa + sc
        head = lambda n: nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                                 param_dtype=jnp.float32, name=n)
        return fused, head("fuse_out")(fused), head("sa_out")(sa), \
            head("sc_out")(sc)


class DualAttentionUNet2D(nn.Module):
    """Dual-attention UNet (reference ``dim2/dual_attention_unet.py``
    ``DAUNet`` :8-47): the plain 2-block-per-stage UNet encoder/decoder with
    a DANet dual-attention head on the 16×-downsampled bottleneck. Stage
    widths (1,2,4,8,16)·base match the reference; downsampling is strided
    residual blocks (this zoo's idiom) instead of maxpool."""

    num_classes: int
    base_chan: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = self.base_chan
        x = x.astype(self.dtype)

        def stage(h, c, strides):
            h = BasicBlock2D(c, strides=strides, dtype=self.dtype)(h)
            return BasicBlock2D(c, dtype=self.dtype)(h)

        e1 = stage(x, b, 1)
        e2 = stage(e1, 2 * b, 2)
        e3 = stage(e2, 4 * b, 2)
        e4 = stage(e3, 8 * b, 2)
        e5 = stage(e4, 16 * b, 2)
        out, _, _, _ = DAHead2D(self.num_classes, dtype=self.dtype,
                                name="da_head")(e5)
        for skip, c in ((e4, 8 * b), (e3, 4 * b), (e2, 2 * b), (e1, b)):
            out = _resize2d(out, skip.shape[1:3]).astype(self.dtype)
            out = stage(jnp.concatenate([out, skip], axis=-1), c, 1)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                         param_dtype=jnp.float32, name="outc")(out)
        return {"segmentation": logits}


class TransUNet2D(nn.Module):
    """CNN encoder + ViT bottleneck + conv decoder (Chen et al. 2021 layout,
    reference ``dim2/transunet.py``)."""

    num_classes: int
    base_chan: int = 32
    hidden: int = 256
    depth: int = 4
    heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = self.base_chan
        x = x.astype(self.dtype)
        e1 = BasicBlock2D(b, dtype=self.dtype)(x)
        e2 = BasicBlock2D(2 * b, strides=2, dtype=self.dtype)(e1)
        e3 = BasicBlock2D(4 * b, strides=2, dtype=self.dtype)(e2)
        e4 = BasicBlock2D(8 * b, strides=2, dtype=self.dtype)(e3)

        B, H, W, _ = e4.shape
        tok = nn.Dense(self.hidden, dtype=self.dtype,
                       param_dtype=jnp.float32)(e4.reshape(B, H * W, -1))
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (1, H * W, self.hidden), jnp.float32)
        tok = TransformerBlock(self.depth, self.heads,
                               self.hidden // self.heads, self.hidden * 2,
                               dtype=self.dtype)(tok + pos.astype(tok.dtype))
        out = tok.reshape(B, H, W, self.hidden)
        for skip, c in ((e3, 4 * b), (e2, 2 * b), (e1, b)):
            out = _resize2d(out, skip.shape[1:3]).astype(self.dtype)
            out = BasicBlock2D(c, dtype=self.dtype)(
                jnp.concatenate([out, skip], axis=-1)
            )
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                         param_dtype=jnp.float32, name="outc")(out)
        return {"segmentation": logits}
