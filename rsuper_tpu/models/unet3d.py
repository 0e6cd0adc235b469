"""3D UNet / ResUNet (flax.linen, channels-last).

Functional equivalent of the reference's ``rsuper_train/model/dim3/unet.py``
(+ ``unet_utils.py``): an encoder of `inconv` + 4 down blocks (channel
multipliers 1,2,4,8,10 × base), a mirrored decoder with skip concatenation,
and a 1x1x1 class head. ``block='BasicBlock'`` gives the ResUNet used by
``config/abdomenatlas/resunet_3d.yaml`` (norm 'in').

TPU-first notes: channels-last convs (MXU-friendly), strided-conv or
max-pool downsampling, optional deep-supervision head (disabled by default —
the reference UNet has none; MedFormer provides one) so the R-Super
``ball_dice_last`` loss routing can also be used with this backbone.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import BLOCKS, resize_trilinear

Dtype = Any


def _scale3(s):
    return (s,) * 3 if isinstance(s, int) else tuple(s)


class DownBlock(nn.Module):
    features: int
    num_blocks: int = 2
    block: str = "BasicBlock"
    pool: bool = True
    down_scale: Any = 2
    kernel_size: Any = 3
    norm: str = "in"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = _scale3(self.down_scale)
        Block = BLOCKS[self.block]
        if self.pool:
            x = nn.max_pool(x, scale, strides=scale)
            x = Block(self.features, kernel_size=self.kernel_size,
                      norm=self.norm, dtype=self.dtype)(x)
        else:
            x = Block(self.features, kernel_size=self.kernel_size,
                      strides=scale[0], norm=self.norm, dtype=self.dtype)(x)
        for _ in range(self.num_blocks - 1):
            x = Block(self.features, kernel_size=self.kernel_size,
                      norm=self.norm, dtype=self.dtype)(x)
        return x


class UpBlock(nn.Module):
    features: int
    num_blocks: int = 2
    block: str = "BasicBlock"
    kernel_size: Any = 3
    norm: str = "in"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_low, x_skip):
        x = resize_trilinear(x_low, x_skip.shape[1:4])
        x = jnp.concatenate([x, x_skip.astype(x.dtype)], axis=-1)
        Block = BLOCKS[self.block]
        for _ in range(self.num_blocks):
            x = Block(self.features, kernel_size=self.kernel_size,
                      norm=self.norm, dtype=self.dtype)(x)
        return x


class UNet3D(nn.Module):
    """Returns ``{'segmentation': logits}`` (or ``[logits, aux]`` with
    ``aux_head=True``), logits float32 channels-last."""

    num_classes: int
    base_chan: int = 32
    block: str = "BasicBlock"
    pool: bool = False
    norm: str = "in"
    scale: Sequence[Any] = (2, 2, 2, 2)
    kernel_size: Sequence[Any] = (3, 3, 3, 3, 3)
    aux_head: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = self.base_chan
        x = x.astype(self.dtype)
        Block = BLOCKS[self.block]
        # inconv: plain conv then one block (reference unet_utils.inconv)
        x0 = nn.Conv(b, (3, 3, 3), padding="SAME", use_bias=False,
                     dtype=self.dtype, param_dtype=jnp.float32)(x)
        x0 = Block(b, kernel_size=self.kernel_size[0], norm=self.norm,
                   dtype=self.dtype)(x0)

        chans = [2 * b, 4 * b, 8 * b, 10 * b]
        skips = [x0]
        h = x0
        for i, c in enumerate(chans):
            h = DownBlock(c, block=self.block, pool=self.pool,
                          down_scale=self.scale[i],
                          kernel_size=self.kernel_size[min(i + 1, 4)],
                          norm=self.norm, dtype=self.dtype)(h)
            skips.append(h)

        out = skips[-1]
        aux = None
        up_chans = [8 * b, 4 * b, 2 * b, b]
        for i, c in enumerate(up_chans):
            out = UpBlock(c, block=self.block,
                          kernel_size=self.kernel_size[3 - i],
                          norm=self.norm, dtype=self.dtype)(out, skips[3 - i])
            if self.aux_head and i == 1:
                a = nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype,
                            param_dtype=jnp.float32, name="aux_out")(out)
                aux = resize_trilinear(a, x.shape[1:4])

        logits = nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32, name="outc")(out)
        if self.aux_head:
            return {"segmentation": [logits, aux]}
        return {"segmentation": logits}
