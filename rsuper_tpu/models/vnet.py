"""V-Net (flax.linen, channels-last).

Functional equivalent of the reference's ``rsuper_train/model/dim3/vnet.py``
(V-Net: Milletari et al. 2016): 5x5x5 convs with residual input additions,
strided-conv down / transposed-conv up transitions, feature concatenation on
the decoder. PReLU is kept; the always-training BatchNorm quirk of the
reference (ContBatchNorm3d) is replaced by InstanceNorm — batch-independent,
the same role on TPU without cross-replica stats.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import instance_norm

Dtype = Any


class PReLU(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (x.shape[-1],),
                       jnp.float32)
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


class LUConv(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (5, 5, 5), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        return PReLU(dtype=self.dtype)(instance_norm(h))


class DownTransition(nn.Module):
    features: int
    n_convs: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        down = nn.Conv(self.features, (2, 2, 2), strides=(2, 2, 2),
                       dtype=self.dtype, param_dtype=jnp.float32)(x)
        down = PReLU(dtype=self.dtype)(instance_norm(down))
        h = down
        for _ in range(self.n_convs):
            h = LUConv(self.features, dtype=self.dtype)(h)
        return PReLU(dtype=self.dtype)(h + down)


class UpTransition(nn.Module):
    features: int
    n_convs: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        up = nn.ConvTranspose(self.features // 2, (2, 2, 2), strides=(2, 2, 2),
                              dtype=self.dtype, param_dtype=jnp.float32)(x)
        up = PReLU(dtype=self.dtype)(instance_norm(up))
        cat = jnp.concatenate([up, skip.astype(up.dtype)], axis=-1)
        h = cat
        for _ in range(self.n_convs):
            h = LUConv(self.features, dtype=self.dtype)(h)
        return PReLU(dtype=self.dtype)(h + cat)


class VNet(nn.Module):
    num_classes: int
    base_chan: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = self.base_chan
        x = x.astype(self.dtype)
        h = nn.Conv(b, (5, 5, 5), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        h = instance_norm(h)
        # input residual: tile the single input channel across features
        h = PReLU(dtype=self.dtype)(h + jnp.repeat(x, b // x.shape[-1], axis=-1))
        x1 = h
        x2 = DownTransition(2 * b, 1, dtype=self.dtype)(x1)
        x3 = DownTransition(4 * b, 2, dtype=self.dtype)(x2)
        x4 = DownTransition(8 * b, 3, dtype=self.dtype)(x3)
        x5 = DownTransition(16 * b, 2, dtype=self.dtype)(x4)
        h = UpTransition(16 * b, 2, dtype=self.dtype)(x5, x4)
        h = UpTransition(8 * b, 2, dtype=self.dtype)(h, x3)
        h = UpTransition(4 * b, 1, dtype=self.dtype)(h, x2)
        h = UpTransition(2 * b, 1, dtype=self.dtype)(h, x1)
        logits = nn.Conv(self.num_classes, (1, 1, 1), dtype=jnp.float32,
                         param_dtype=jnp.float32, name="outc")(h)
        return {"segmentation": logits}
