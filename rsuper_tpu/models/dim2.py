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
