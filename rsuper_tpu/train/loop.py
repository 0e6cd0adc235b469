"""The training driver: epochs × steps with on-device augmentation, loss-NaN
guard, EMA, checkpointing, periodic validation.

Reference: ``rsuper_train/train_ddp.py`` ``train_net`` (:65) /
``train_epoch`` (:235). Differences by design (SPMD, SURVEY.md §2.4): no
process spawner — one host process drives the whole mesh; the batch is global
and sharded over the ``data`` axis; gradient all-reduce is inserted by XLA.
The reference's hard NaN abort (``losses_foundation.py:1070``) lives here on
the host, where raising is allowed.
"""

from __future__ import annotations

import time
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrainConfig
from ..data.pipeline import PrefetchLoader, device_augment
from ..data.sampler import ChunkedSampler
from ..losses import LesionChannelMap
from ..parallel import make_mesh, shard_batch
from ..train.checkpoint import CheckpointManager
from ..train.optim import make_optimizer
from ..train.state import create_train_state
from ..train.step import build_train_step
from ..utils import AverageMeter, MetricsLogger, setup_logger
from ..utils.logging import dump_config


def init_params_on_host(model, rng, example):
    """Initialise parameters with a CPU-jitted init and leave placement to the
    caller. Un-jitted flax init dispatches thousands of tiny ops — over a
    remote-TPU link that is minutes of latency; on-host jit is seconds."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        return jax.jit(model.init)(rng, example)


def train(
    cfg: TrainConfig,
    model,
    dataset,
    test_cases: Optional[Iterable] = None,
    mesh=None,
    max_steps: Optional[int] = None,
    profile_steps: int = 0,
):
    """Run the full training job; returns the final TrainState."""
    exp_dir = f"{cfg.cp_path}/{cfg.unique_name}"
    logger = setup_logger(exp_dir)
    metrics_log = MetricsLogger(exp_dir)
    dump_config(exp_dir, cfg)

    if mesh is None:
        # the global batch shards over the data axis; use the largest device
        # count that divides it (reference divides batch by ngpus,
        # train_ddp.py:632 — same constraint, surfaced at mesh build)
        import math

        n_dev = len(jax.devices())
        k = math.gcd(cfg.batch_size, n_dev)
        if k < n_dev:
            print(f"[train] batch_size {cfg.batch_size} not divisible by "
                  f"{n_dev} devices; using a {k}-device data mesh", flush=True)
        mesh = make_mesh(jax.devices()[:k])
    lmap = LesionChannelMap.from_classes(cfg.classes)
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    tx = make_optimizer(
        cfg.optimizer, cfg.base_lr, cfg.warmup_epochs, cfg.epochs,
        cfg.iter_per_epoch, cfg.weight_decay, cfg.betas, clip_norm=cfg.clip_norm,
    )
    example = jnp.zeros((1, *cfg.training_size, 1), jnp.float32)
    rng = jax.random.PRNGKey(cfg.seed)
    params = init_params_on_host(model, rng, example)
    from ..train.state import TrainState
    import optax

    state = TrainState(
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if cfg.ema else None,
        step=jnp.zeros((), jnp.int32),
        tx=tx,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    state = jax.device_put(state, NamedSharding(mesh, P()))

    ckpt = CheckpointManager(exp_dir, save_every=cfg.save_every)
    if cfg.pretrained:
        from ..train.checkpoint import load_pretrained_params

        state = load_pretrained_params(state, cfg.pretrained)
        logger.info("loaded pretrained weights from %s (non-strict)",
                    cfg.pretrained)
    if cfg.resume and ckpt.has("latest"):
        state = ckpt.restore(state, "latest")
        logger.info("resumed from step %d", int(state.step))

    step_fn = build_train_step(
        model, lmap, cfg.loss_config(), mesh=mesh, ema_alpha=cfg.ema_alpha,
        model_genesis=cfg.model_genesis_pretrain, clip_only=cfg.clip_pretrain,
    )

    sampler = ChunkedSampler(
        len(dataset), cfg.iter_per_epoch * cfg.batch_size,
        shard=cfg.shard_index, num_shards=cfg.data_shards, seed=cfg.seed,
    )
    aug_key = jax.random.PRNGKey(cfg.seed + 1)

    from ..utils.profiling import PhaseTimer, TraceCapture

    tracer = (
        TraceCapture(f"{exp_dir}/trace", num_steps=profile_steps)
        if profile_steps else None
    )
    timer = PhaseTimer()

    start_epoch = int(state.step) // cfg.iter_per_epoch
    total_steps = 0
    for epoch in range(start_epoch, cfg.epochs):
        loader = PrefetchLoader(
            dataset, cfg.batch_size, sampler.epoch_indices(epoch),
            num_workers=cfg.num_workers,
        )
        loss_meter = AverageMeter("loss")
        t_meter = AverageMeter("s/it")
        t0 = time.time()
        for batch in loader:
            if tracer is not None:
                tracer.step(total_steps)
            aug_key, k = jax.random.split(aug_key)
            with timer.phase("h2d"):
                batch = shard_batch(batch, mesh)
            with timer.phase("augment"):
                batch = device_augment(
                    batch, k, crop_size=tuple(cfg.training_size),
                    scale=tuple(cfg.scale), rotate=tuple(cfg.rotate),
                    translate=tuple(cfg.translate),
                )
                # lax.map inside device_augment replicates its outputs;
                # restore the data-axis sharding the train step expects
                batch = shard_batch(batch, mesh)
            with timer.phase("step"):
                state, losses = step_fn(state, batch)
                loss = float(losses["overall"])
            if not np.isfinite(loss):
                raise FloatingPointError(
                    f"loss is NaN/Inf at step {int(state.step)} — aborting before "
                    "it poisons the weights (reference losses_foundation.py:1070)"
                )
            loss_meter.update(loss)
            t_meter.update(time.time() - t0)
            t0 = time.time()
            total_steps += 1
            if total_steps % 50 == 0 or total_steps == 1:
                logger.info(
                    "epoch %d step %d %s %s", epoch, int(state.step),
                    loss_meter, t_meter,
                )
                metrics_log.log(int(state.step),
                                {k: float(v) for k, v in losses.items()},
                                prefix="train/")
            if max_steps is not None and total_steps >= max_steps:
                ckpt.save_epoch(state, epoch)
                return state

        val_metric = None
        if test_cases is not None and cfg.val_freq and (epoch + 1) % cfg.val_freq == 0:
            from .validation import validate_cases

            def apply_fn(params, x):
                out = model.apply(params, x)["segmentation"]
                return out[0] if isinstance(out, (list, tuple)) else out

            results = validate_cases(
                apply_fn,
                state.ema_params if cfg.ema else state.params,
                test_cases, len(cfg.classes), window=cfg.training_size,
            )
            val_metric = float(np.mean(results["dice"]))
            logger.info("epoch %d val dice %.4f", epoch, val_metric)
            metrics_log.log(int(state.step), {"dice_mean": val_metric}, prefix="val/")

        ckpt.save_epoch(state, epoch, metric=val_metric)
        logger.info("epoch %d done: %s phases=%s", epoch, loss_meter,
                    timer.summary())
    if tracer is not None:
        tracer.close()
    return state
