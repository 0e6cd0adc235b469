"""UNet++ (flax.linen, channels-last).

Functional equivalent of the reference's ``rsuper_train/model/dim3/unetpp.py``
(Zhou et al. 2018): nested dense skip pathways X^{i,j} where each decoder node
concatenates all same-resolution predecessors plus the upsampled deeper node.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvNormAct, resize_trilinear

Dtype = Any


class _Block(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvNormAct(self.features, 3, norm="in", act="relu", dtype=self.dtype)(x)
        return ConvNormAct(self.features, 3, norm="in", act="relu", dtype=self.dtype)(x)


class UNetPlusPlus(nn.Module):
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
                h = nn.max_pool(grid[(i - 1, 0)], (2,) * 3, (2,) * 3)
            grid[(i, 0)] = _Block(chans[i], dtype=self.dtype,
                                  name=f"x{i}_0")(h)

        for j in range(1, self.depth + 1):
            for i in range(self.depth + 1 - j):
                up = resize_trilinear(grid[(i + 1, j - 1)],
                                      grid[(i, 0)].shape[1:4]).astype(self.dtype)
                cat = jnp.concatenate(
                    [grid[(i, k)] for k in range(j)] + [up], axis=-1
                )
                grid[(i, j)] = _Block(chans[i], dtype=self.dtype,
                                      name=f"x{i}_{j}")(cat)

        logits = nn.Conv(self.num_classes, (1, 1, 1), dtype=jnp.float32,
                         param_dtype=jnp.float32, name="outc")(grid[(0, self.depth)])
        return {"segmentation": logits}
