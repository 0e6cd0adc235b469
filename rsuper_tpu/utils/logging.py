"""Logging + metrics sink.

Reference (``rsuper_train/utils.py:10-39`` + TensorBoard writers in
``train_ddp.py``): per-rank python logging, config snapshot to ``config.txt``,
scalar curves. TensorBoard isn't guaranteed in this environment, so scalars
land in an append-only JSONL the user can plot with anything (and TB if
installed)."""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from typing import Any, Dict


def _rank_suffix() -> str:
    """'' single-process; '.rankN' when jax runs multi-process (keeps the
    per-rank log/metric files of a shared exp dir from interleaving)."""
    try:
        import jax

        if jax.process_count() > 1:
            return f".rank{jax.process_index()}"
    except Exception:
        pass
    return ""


def _is_primary() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def setup_logger(exp_dir: str, name: str = "rsuper") -> logging.Logger:
    os.makedirs(exp_dir, exist_ok=True)
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        fh = logging.FileHandler(
            os.path.join(exp_dir, f"train{_rank_suffix()}.log"))
        sh = logging.StreamHandler()
        fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
        fh.setFormatter(fmt)
        sh.setFormatter(fmt)
        logger.addHandler(fh)
        logger.addHandler(sh)
    return logger


def dump_config(exp_dir: str, cfg) -> None:
    os.makedirs(exp_dir, exist_ok=True)
    with open(os.path.join(exp_dir, "config.txt"), "w") as f:
        if dataclasses.is_dataclass(cfg):
            cfg = dataclasses.asdict(cfg)
        for k, v in sorted(cfg.items()):
            f.write(f"{k}: {v}\n")


class MetricsLogger:
    """JSONL scalars + TensorBoard event file (both always on: the TB writer
    is dependency-free, ``utils/tb_events.py`` — reference
    ``train_ddp.py:138,387-389`` SummaryWriter parity)."""

    def __init__(self, exp_dir: str, tensorboard: bool = True):
        os.makedirs(exp_dir, exist_ok=True)
        self.path = os.path.join(exp_dir, f"metrics{_rank_suffix()}.jsonl")
        self.tb = None
        # TB is rank-gated (unlike the rank-SUFFIXED jsonl): every host logs
        # identical scalars, and N writers in one tb/ dir render as N
        # overlapping series per tag
        if tensorboard and _is_primary():
            try:
                from .tb_events import EventWriter

                self.tb = EventWriter(os.path.join(exp_dir, "tb"))
            except Exception:  # pragma: no cover - never block training on TB
                self.tb = None

    def log(self, step: int, values: Dict[str, Any], prefix: str = ""):
        rec = {"step": int(step), "time": time.time()}
        for k, v in values.items():
            key = f"{prefix}{k}" if prefix else k
            try:
                rec[key] = float(v)
            except (TypeError, ValueError):
                rec[key] = v
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self.tb is not None:
            for k, v in rec.items():
                if k in ("step", "time") or not isinstance(v, float):
                    continue
                self.tb.add_scalar(k, v, step)
