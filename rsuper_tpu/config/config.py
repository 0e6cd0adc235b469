"""Configuration: YAML presets merged with CLI overrides.

Mirrors the reference's two-layer flag system (SURVEY.md §5: per-
(dataset, model) YAML merged into an argparse namespace with ~70 CLI
overrides, ``train_ddp.py:392-548``), collapsed into one typed dataclass.
Shipped presets correspond to the reference's
``config/abdomenatlas_ufo/medformer_3d.yaml`` and
``config/abdomenatlas/resunet_3d.yaml``.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import yaml


@dataclasses.dataclass
class TrainConfig:
    # data
    data_root: str = ""
    report_root: str = ""
    reports: str = ""
    classes: Tuple[str, ...] = ()
    report_classes: Tuple[str, ...] = ()
    tumor_classes: Tuple[str, ...] = ("kidney", "pancreas")
    training_size: Tuple[int, int, int] = (128, 128, 128)
    batch_size: int = 2  # per-step GLOBAL batch (sharded over the data axis)
    num_workers: int = 8
    balance_supervision: bool = True
    # model
    arch: str = "medformer"
    model_args: Dict[str, Any] = dataclasses.field(default_factory=dict)
    compute_dtype: str = "bfloat16"
    # optimisation
    epochs: int = 150
    iter_per_epoch: int = 1000
    optimizer: str = "adamw"
    base_lr: float = 6e-4
    betas: Tuple[float, float] = (0.9, 0.999)
    weight_decay: float = 0.05
    warmup_epochs: int = 5
    clip_norm: float = 1.0
    ema: bool = True
    ema_alpha: float = 0.99
    # ZeRO-1: shard Adam moments over the mesh data axis (reduce_scatter /
    # all_gather inserted by XLA from sharding specs; parallel/mesh.py)
    zero_opt: bool = False
    # also shard the EMA parameter copy over the data axis (saves another
    # 1x params of f32 per chip; gathered once per validation/export)
    zero_ema: bool = False
    # spatial (context-parallel) sharding: split each volume's depth axis
    # over an N-chip mesh `model` axis (activation memory / chip ÷ N; XLA
    # inserts conv halo exchanges). Disables Pallas kernels (ops/dispatch.py).
    spatial_shard: int = 1
    # augment in the PrefetchLoader workers (numpy/scipy,
    # data/host_augment.py) instead of on device — the reference's
    # DataLoader-worker model: on a many-core TPU-VM host the augmentation
    # overlaps with the train step instead of serialising with it on-chip
    host_augment: bool = False
    # device-resident input prefetch depth: a transfer thread device_puts
    # (and dispatches the augment for) batch N+1 while step N runs
    # (data/pipeline.DevicePrefetcher). 0 = inline transfers, the DEFAULT:
    # the round-5b A/B measured inline at 4.52 patches/s vs 2.08 with the
    # transfer thread (exp_loop_inline_r5b.log vs exp_loop_r5b.log) — JAX's
    # async dispatch already overlaps the H2D/augment/step queue through
    # the relay, and a second thread issuing transfers contends with the
    # step thread instead of hiding anything. Depth > 0 re-enables the
    # thread for hosts where it measures faster.
    device_prefetch: int = 0
    # losses (see losses.dispatcher.LossConfig)
    loss: str = "ball_dice_last"
    aux_weight: Tuple[float, ...] = (0.5, 0.5)
    seg_loss: float = 1.0
    report_volume_loss_basic: float = 1.0
    volume_loss_tolerance: float = 0.2
    ball_bce_weight: float = 1.0
    ball_dice_weight: float = 1.0
    ball_volume_margin: float = 0.2
    standard_ce_ball: bool = False
    classification_branch: bool = False
    class_weights: bool = False
    # augmentation
    scale: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    rotate: Tuple[float, float, float] = (30.0, 30.0, 30.0)
    translate: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    # validation / checkpointing
    val_freq: int = 20000
    cp_path: str = "./exp"
    unique_name: str = "test"
    save_every: int = 25
    resume: bool = False
    pretrained: str = ""
    # class-surgery transfer (reference --update_output_layer --old_classes,
    # train_ddp.py:437-438): a YAML/JSON list file or comma-separated string
    # of the DONOR checkpoint's class list (sorted, like the reference).
    # When set, the --pretrained load remaps the output-head kernels class
    # by class (models/surgery.update_output_layers) instead of requiring
    # identical head shapes.
    old_classes: str = ""
    # baselines
    model_genesis_pretrain: bool = False
    clip_pretrain: bool = False
    # directory of per-case report-embedding .npy files (reference
    # --clip_source, train_ddp.py:450-451); required when clip_pretrain
    clip_source: str = ""
    # 2d = slice training over models/dim2.py (reference --dimension 2d);
    # inferred from training_size when left as "auto"
    dimension: str = "auto"
    # runtime
    seed: int = 0
    data_shards: int = 1
    shard_index: int = 0
    # fetch the loss to the host (NaN guard + meters) every N steps only —
    # a per-step float() blocks on the device and defeats async dispatch
    # (worst case a NaN poisons N-1 extra steps before the abort; the saved
    # checkpoints are epoch-grained so nothing durable is lost)
    nan_check_every: int = 20

    def loss_config(self):
        from ..losses import LossConfig

        return LossConfig(
            loss=self.loss,
            aux_weight=tuple(self.aux_weight),
            seg_loss=self.seg_loss,
            report_volume_loss_basic=self.report_volume_loss_basic,
            volume_loss_tolerance=self.volume_loss_tolerance,
            ball_bce_weight=self.ball_bce_weight,
            ball_dice_weight=self.ball_dice_weight,
            standard_ce_ball=self.standard_ce_ball,
            ball_volume_margin=self.ball_volume_margin,
            classification_branch=self.classification_branch,
        )


DEFAULT_CONFIGS: Dict[str, Dict[str, Any]] = {
    # reference config/abdomenatlas_ufo/medformer_3d.yaml
    "abdomenatlas_ufo/medformer_3d": dict(
        arch="medformer",
        model_args=dict(
            base_chan=32,
            map_size=(3, 3, 3),
            conv_num=(2, 0, 0, 0, 0, 0, 2, 2),
            trans_num=(0, 2, 4, 6, 4, 2, 0, 0),
            chan_num=(64, 128, 256, 320, 256, 128, 64, 32),
            num_heads=(1, 4, 8, 10, 8, 4, 1, 1),
            fusion_depth=2,
            fusion_dim=320,
            fusion_heads=10,
            expansion=4,
            proj_type="depthwise",
            norm="in",
            act="relu",
            aux_loss=True,
        ),
        training_size=(128, 128, 128),
        epochs=150,
        iter_per_epoch=1000,
        optimizer="adamw",
        base_lr=6e-4,
        weight_decay=0.05,
        aux_weight=(0.5, 0.5),
        scale=(0.0, 0.0, 0.0),
        rotate=(30.0, 30.0, 30.0),
        translate=(0.0, 0.0, 0.0),
        ema=True,
        ema_alpha=0.99,
        val_freq=20000,
    ),
    # reference config/abdomenatlas/resunet_3d.yaml
    "abdomenatlas/resunet_3d": dict(
        arch="resunet",
        model_args=dict(base_chan=32, block="BasicBlock", norm="in"),
        training_size=(128, 128, 128),
        epochs=1000,
        iter_per_epoch=1000,
        optimizer="adamw",
        base_lr=6e-4,
        weight_decay=0.05,
        scale=(0.3, 0.3, 0.3),
        rotate=(30.0, 30.0, 30.0),
        ema=True,
        val_freq=50,
    ),
    # 2D slice-training pathway (the reference's --dimension 2d model zoo,
    # model/dim2 — it ships no 2D dataset/config; see data/dataset2d.py)
    "slices/resunet_2d": dict(
        arch="resunet_2d",
        model_args=dict(base_chan=32),
        training_size=(256, 256),
        dimension="2d",
        epochs=300,
        iter_per_epoch=500,
        optimizer="adamw",
        base_lr=6e-4,
        weight_decay=0.05,
        loss="dice",
        report_volume_loss_basic=0.0,
        ema=True,
        val_freq=50,
    ),
}


def load_config(
    preset: Optional[str] = None,
    yaml_path: Optional[str] = None,
    overrides: Optional[Dict[str, Any]] = None,
) -> TrainConfig:
    """Build a TrainConfig from (preset | yaml file) + overrides (CLI wins)."""
    values: Dict[str, Any] = {}
    if preset is not None:
        if preset not in DEFAULT_CONFIGS:
            raise ValueError(f"unknown preset {preset!r}; options: {sorted(DEFAULT_CONFIGS)}")
        values.update(DEFAULT_CONFIGS[preset])
    if yaml_path is not None:
        with open(yaml_path) as f:
            values.update(yaml.safe_load(f) or {})
    for k, v in (overrides or {}).items():
        if v is not None:
            values[k] = v
    field_names = {f.name for f in dataclasses.fields(TrainConfig)}
    unknown = set(values) - field_names
    if unknown:
        raise ValueError(f"unknown config keys: {sorted(unknown)}")
    for key in ("classes", "report_classes", "tumor_classes", "training_size",
                "aux_weight", "scale", "rotate", "translate", "betas"):
        if key in values and isinstance(values[key], list):
            values[key] = tuple(values[key])
    return TrainConfig(**values)
