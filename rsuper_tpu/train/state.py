"""Train state: params, optimizer state, EMA params, step counter — one pytree
that checkpoints atomically (reference checkpoint contract:
``train_ddp.py:180-222`` saves model / ema_model / optimizer / epoch)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, ema_alpha: float = 0.99):
        from .optim import ema_update

        updates, opt_state = self.tx.update(grads, self.opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        new_step = self.step + 1
        ema = (
            ema_update(self.ema_params, params, new_step, ema_alpha)
            if self.ema_params is not None
            else None
        )
        return self.replace(
            params=params, opt_state=opt_state, ema_params=ema, step=new_step
        )


def create_train_state(
    model,
    rng,
    example_input,
    tx: optax.GradientTransformation,
    ema: bool = True,
) -> TrainState:
    params = model.init(rng, example_input)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if ema else None,
        step=jnp.zeros((), jnp.int32),
        tx=tx,
    )
