"""Model-Genesis restoration loss (self-supervised pretraining baseline).

Reference: ``rsuper_train/training/losses_foundation.py:667-674``: plain
voxel-wise MSE between the restored volume and the original.
"""

import jax.numpy as jnp


def model_genesis_loss(restored, target):
    l = jnp.mean((restored.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
    return {"genesis_loss": l, "overall": l}
