"""Optimizer, LR schedule and EMA.

Reference: ``rsuper_train/training/utils.py``
* ``get_optimizer`` (:10) — AdamW(eps=1e-5)/Adam/SGD on a single param group;
* ``exp_lr_scheduler_with_warmup`` (:119) — exponential warm-up
  ``e^(10·(t/w − 1))`` reaching exactly 1.0 at the warm-up boundary, then
  polynomial decay ``(1 − e/E)^0.9`` (per epoch);
* ``update_ema_variables`` (:154) — EMA with ``alpha = min(1 − 1/(step+1), a)``;
* gradient clipping to global norm 1.0 (``train_ddp.py:352``).

TPU-native: everything is an optax transform over pytrees, evaluated inside
the jitted train step (the schedule is a function of the step counter, not a
host-side mutation of param groups).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def warmup_poly_schedule(
    base_lr: float,
    warmup_epochs: int,
    max_epochs: int,
    steps_per_epoch: int,
    power: float = 0.9,
):
    """Per-step schedule reproducing the reference's per-epoch curve."""

    def schedule(step):
        epoch = jnp.floor(step / steps_per_epoch)
        warm = jnp.exp(10.0 * (epoch / max(warmup_epochs, 1) - 1.0))
        warm = jnp.where(epoch >= warmup_epochs, 1.0, warm)
        decay = jnp.maximum(1.0 - epoch / max_epochs, 0.0) ** power
        mult = jnp.where(epoch <= warmup_epochs, warm, decay) if warmup_epochs else decay
        return base_lr * mult

    return schedule


def make_optimizer(
    name: str = "adamw",
    base_lr: float = 6e-4,
    warmup_epochs: int = 5,
    max_epochs: int = 150,
    steps_per_epoch: int = 1000,
    weight_decay: float = 0.05,
    betas=(0.9, 0.999),
    momentum: float = 0.9,
    clip_norm: Optional[float] = 1.0,
) -> optax.GradientTransformation:
    schedule = warmup_poly_schedule(base_lr, warmup_epochs, max_epochs, steps_per_epoch)
    name = name.lower()
    if name == "adamw":
        opt = optax.adamw(schedule, b1=betas[0], b2=betas[1], eps=1e-5,
                          weight_decay=weight_decay)
    elif name == "adam":
        opt = optax.adam(schedule, b1=betas[0], b2=betas[1])
    elif name == "sgd":
        opt = optax.sgd(schedule, momentum=momentum)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    if clip_norm is not None:
        return optax.chain(optax.clip_by_global_norm(clip_norm), opt)
    return opt


def ema_update(ema_params, params, step, alpha: float = 0.99):
    """EMA pytree update with the reference's step-dependent alpha ramp."""
    a = jnp.minimum(1.0 - 1.0 / (step.astype(jnp.float32) + 1.0), alpha)
    return jax.tree.map(lambda e, p: a * e + (1.0 - a) * p, ema_params, params)
