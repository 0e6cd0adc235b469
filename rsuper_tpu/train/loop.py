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
from ..data.pipeline import PrefetchLoader, build_augment_step
from ..data.sampler import ChunkedSampler
from ..losses import LesionChannelMap
from ..parallel import make_mesh
from ..parallel.multihost import global_key_slices, local_batch_to_global
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
    # local_devices: in multi-process jobs, devices("cpu")[0] can be another
    # process's (non-addressable) device — init must land on THIS host
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        return jax.jit(model.init)(rng, example)


def _gathered_ema(state, cfg, mesh):
    """With ``cfg.zero_ema`` the EMA copy lives sharded over the data axis;
    gather it back to replicated before it leaves the train loop (validation,
    end-of-fold eval, export) so consumers that ``device_get`` or re-shard it
    work unchanged — including in multi-host jobs where host-side gets of
    non-addressable shards raise."""
    if cfg.zero_ema and state.ema_params is not None:
        from ..parallel.mesh import gather_tree

        return state.replace(ema_params=gather_tree(state.ema_params, mesh))
    return state


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
        sp = max(1, cfg.spatial_shard)
        assert n_dev % sp == 0, (
            f"spatial_shard {sp} must divide the {n_dev} available devices"
        )
        if sp > 1:
            # XLA SPMD conv grads are silently wrong once a feature map
            # drops below 2 planes per shard (parallel/mesh.spatial_constraint
            # — measured 3-7x off at 1 plane/shard with matching loss); the
            # model zoo downsamples depth at most 16x
            assert cfg.training_size[0] // 16 >= 2 * sp, (
                f"spatial_shard {sp} too large for depth "
                f"{cfg.training_size[0]}: the deepest feature map "
                f"({cfg.training_size[0] // 16} planes) must keep >= 2 planes "
                "per shard or XLA SPMD conv gradients are silently incorrect"
            )
        k = math.gcd(cfg.batch_size, n_dev // sp)
        if k * sp < n_dev:
            print(f"[train] using a {k}x{sp} (data x model) mesh over "
                  f"{n_dev} devices (batch {cfg.batch_size})", flush=True)
        mesh = make_mesh(jax.devices()[: k * sp], data=k, model=sp)
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

    repl = NamedSharding(mesh, P())
    state_shardings = None
    if cfg.zero_opt or cfg.zero_ema:
        # ZeRO-1: Adam moments (and optionally the EMA copy) sharded over
        # the data axis; XLA inserts reduce_scatter/all_gather from the specs
        from ..parallel.mesh import zero_state_shardings

        state_shardings = zero_state_shardings(mesh, state,
                                               shard_ema=cfg.zero_ema,
                                               shard_opt=cfg.zero_opt)
    if jax.process_count() == 1:
        state = jax.device_put(
            state, state_shardings if state_shardings is not None else repl
        )
    else:
        # multihost: device_put cannot target non-addressable devices; every
        # process holds the identical FULL host value (same seed), so each
        # addressable shard is materialised by indexing into it. (A plain
        # make_array_from_process_local_data would misread the full value as
        # this process's slice for cross-host-sharded specs — the zero_opt
        # case — and inflate the sharded dimension.)
        sh_tree = (state_shardings if state_shardings is not None
                   else jax.tree.map(lambda _: repl, state))

        def assemble(x, s):
            arr = np.asarray(x)
            return jax.make_array_from_callback(
                arr.shape, s, lambda idx: arr[idx]
            )

        state = jax.tree.map(assemble, state, sh_tree)

    ckpt = CheckpointManager(exp_dir, save_every=cfg.save_every)
    if cfg.pretrained:
        from ..train.checkpoint import load_pretrained_params, parse_class_list

        old = parse_class_list(cfg.old_classes) if cfg.old_classes else None
        state = load_pretrained_params(
            state, cfg.pretrained,
            old_classes=old, new_classes=list(cfg.classes),
        )
        logger.info("loaded pretrained weights from %s (%s)", cfg.pretrained,
                    "class surgery" if old else "non-strict")
    if cfg.resume and ckpt.has("latest"):
        state = ckpt.restore(state, "latest")
        logger.info("resumed from step %d", int(state.step))

    step_fn = build_train_step(
        model, lmap, cfg.loss_config(), mesh=mesh, ema_alpha=cfg.ema_alpha,
        model_genesis=cfg.model_genesis_pretrain, clip_only=cfg.clip_pretrain,
        state_shardings=state_shardings,
    )

    # multihost: each process loads 1/process_count of every global batch
    # (the reference's rank-sliced sampler, train_ddp.py:637-644)
    n_proc = jax.process_count()
    assert cfg.batch_size % max(n_proc, 1) == 0, (
        f"global batch {cfg.batch_size} must divide over {n_proc} processes"
    )
    local_bs = cfg.batch_size // n_proc
    shard = cfg.shard_index if n_proc == 1 else jax.process_index()
    num_shards = cfg.data_shards if n_proc == 1 else n_proc
    if cfg.clip_pretrain and hasattr(dataset, "crop_organs"):
        # CLIP pretraining: organ-homogeneous global batches (InfoNCE
        # negatives must not be separable by organ; reference sampler_clip)
        from ..data.sampler import OrganBatchSampler

        # a loader batch must map to exactly one shard-slice of one global
        # organ batch — with extra data shards on a single process the
        # local_bs-sized loader batch would span several global steps and
        # mix organs, silently breaking the sampler's homogeneity contract
        assert num_shards == n_proc, (
            "clip_pretrain requires data_shards == process_count "
            f"(got {num_shards} shards over {n_proc} processes)"
        )
        osampler = OrganBatchSampler(
            dataset.crop_organs(), cfg.batch_size, seed=cfg.seed,
            shard=shard, num_shards=num_shards,
        )
        epoch_indices = lambda e: osampler.epoch_indices(e, cfg.iter_per_epoch)
    else:
        sampler = ChunkedSampler(
            len(dataset), cfg.iter_per_epoch * cfg.batch_size,
            shard=shard, num_shards=num_shards, seed=cfg.seed,
        )
        epoch_indices = sampler.epoch_indices
    aug_key = jax.random.PRNGKey(cfg.seed + 1)
    is_2d = cfg.dimension == "2d" or (
        cfg.dimension == "auto" and len(cfg.training_size) == 2
    )
    host_transform = None
    if is_2d:
        # 2D slices are augmented on host (data/dataset2d.py); no device pass
        augment_fn = None
    elif cfg.host_augment:
        # reference-style worker augmentation (overlaps with device compute)
        from ..data.host_augment import make_host_augment

        augment_fn = None
        host_transform = make_host_augment(
            tuple(cfg.training_size), scale=tuple(cfg.scale),
            rotate=tuple(cfg.rotate), translate=tuple(cfg.translate),
            out_dtype=np.dtype(dtype) if dtype != jnp.bfloat16
            else jnp.bfloat16,
        )
    else:
        augment_fn = build_augment_step(
            mesh, crop_size=tuple(cfg.training_size), scale=tuple(cfg.scale),
            rotate=tuple(cfg.rotate), translate=tuple(cfg.translate),
            out_dtype=dtype, num_classes=len(cfg.classes),
        )

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
            dataset, local_bs, epoch_indices(epoch),
            num_workers=cfg.num_workers, transform=host_transform,
            # device-augment path: bit-pack the mask H2D payload on host
            # (pipeline.pack_record_masks — ~6.5× fewer bytes per step)
            pack_masks=augment_fn is not None,
        )
        aug_key, epoch_key = jax.random.split(aug_key)
        if cfg.device_prefetch > 0:
            # overlap transfer + augment dispatch with the running step
            # (pipeline.DevicePrefetcher); the feeder draws the same
            # deterministic key sequence on every process
            from ..data.pipeline import DevicePrefetcher

            batches = DevicePrefetcher(
                loader, mesh, depth=cfg.device_prefetch,
                augment_fn=augment_fn, key=epoch_key,
                global_batch=cfg.batch_size,
            )
        else:
            def _inline(loader=loader, epoch_key=epoch_key):
                key = epoch_key
                for batch in loader:
                    key, k = jax.random.split(key)
                    # same key on every process (same seed) -> identical
                    # global key table; each process contributes its slice
                    item_keys = global_key_slices(
                        jax.random.split(k, cfg.batch_size), mesh
                    )
                    with timer.phase("h2d"):
                        batch = local_batch_to_global(batch, mesh)
                    if augment_fn is not None:
                        with timer.phase("augment"):
                            batch = augment_fn(batch, item_keys)
                    yield batch

            batches = _inline()
        loss_meter = AverageMeter("loss")
        t_meter = AverageMeter("s/it")
        t0 = time.time()
        check_every = max(1, cfg.nan_check_every)
        for batch in batches:
            if tracer is not None:
                tracer.step(total_steps)
            with timer.phase("step"):
                state, losses = step_fn(state, batch)
            total_steps += 1
            # fetch the loss only every `check_every` steps: a per-step
            # float() round-trips to the device and serialises the async
            # dispatch pipeline (2x step time over a relayed link)
            if (
                total_steps % check_every == 0
                or total_steps == 1
                or total_steps % 50 == 0
                or total_steps == max_steps
            ):
                loss = float(losses["overall"])
                if not np.isfinite(loss):
                    raise FloatingPointError(
                        f"loss is NaN/Inf at step {int(state.step)} — aborting "
                        "before it poisons further weights (reference "
                        "losses_foundation.py:1070; detection lags up to "
                        f"{check_every - 1} steps by design)"
                    )
                loss_meter.update(loss)
            t_meter.update(time.time() - t0)
            t0 = time.time()
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
                ckpt.wait()  # async commits must be durable before we return
                return _gathered_ema(state, cfg, mesh)

        if loss_meter.count == 0 and total_steps > 0:
            # no fetch landed inside this epoch (short epochs + sparse NaN
            # checks): fetch once at the boundary so the summary is real
            loss_meter.update(float(losses["overall"]))

        val_metric = None
        if test_cases is not None and cfg.val_freq and (epoch + 1) % cfg.val_freq == 0:
            from .validation import run_validation

            # sharded EMA: gather once per validation (mesh.gather_tree)
            val_state = _gathered_ema(state, cfg, mesh)
            results = run_validation(model, val_state, cfg, test_cases,
                                     len(cfg.classes), is_2d=is_2d)
            val_metric = float(np.mean(results["dice"]))
            logger.info("epoch %d val dice %.4f", epoch, val_metric)
            metrics_log.log(int(state.step), {"dice_mean": val_metric}, prefix="val/")

        ckpt.save_epoch(state, epoch, metric=val_metric)
        logger.info("epoch %d done: %s phases=%s", epoch, loss_meter,
                    timer.summary())
    if tracer is not None:
        tracer.close()
    ckpt.wait()  # async commits must be durable before we return
    return _gathered_ema(state, cfg, mesh)
