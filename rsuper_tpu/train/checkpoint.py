"""Checkpointing with orbax: latest / every-N / best retention + resume.

Reference contract (``rsuper_train/train_ddp.py:180-222`` +
``utils.py:41-60``): save {epoch, model, ema_model, optimizer} every epoch as
'latest', every 25 epochs, and on best validation Dice; resume restores all
four. Here the whole `TrainState` pytree (params, opt state, EMA, step) is
one atomic orbax checkpoint.
"""

from __future__ import annotations

import atexit
import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

# async commits must land before interpreter exit. Managers hold a STRONG
# reference here exactly while a commit may be in flight (_save adds, wait
# removes): a manager whose owner drops it mid-commit stays reachable until
# the atexit drain lands its data, yet a drained manager is released
# immediately instead of being pinned for the process lifetime (the failure
# modes of a WeakSet and of per-instance atexit.register, respectively).
_PENDING_MANAGERS: "set[CheckpointManager]" = set()


@atexit.register
def _drain_pending_commits() -> None:
    for mgr in list(_PENDING_MANAGERS):
        mgr.wait()


class CheckpointManager:
    def __init__(self, directory: str, save_every: int = 25, max_keep: int = 3,
                 synchronous: bool = False):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_every = save_every
        self.checkpointer = ocp.StandardCheckpointer()
        self.best_metric = -float("inf")
        self.synchronous = synchronous

    def _path(self, tag: str) -> str:
        return os.path.join(self.directory, tag)

    def wait(self) -> None:
        """Block until every pending async commit is durable."""
        try:
            self.checkpointer.wait_until_finished()
        except Exception:  # pragma: no cover - atexit after close
            pass
        _PENDING_MANAGERS.discard(self)

    def _save(self, tag: str, state):
        path = self._path(tag)
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "ema_params": state.ema_params,
            "step": state.step,
        }
        # wait BEFORE saving (a pending commit to the same tag must finish
        # first), not after: the commit then overlaps the next epoch's
        # training (orbax async checkpointing; the reference's torch.save
        # blocks the loop every epoch)
        self.checkpointer.wait_until_finished()
        self.checkpointer.save(path, payload, force=True)
        _PENDING_MANAGERS.add(self)
        if self.synchronous:
            self.wait()

    def save_epoch(self, state, epoch: int, metric: Optional[float] = None):
        self._save("latest", state)
        if self.save_every and (epoch + 1) % self.save_every == 0:
            self._save(f"epoch_{epoch + 1}", state)
        if metric is not None and metric > self.best_metric:
            self.best_metric = metric
            self._save("best", state)

    def restore(self, state, tag: str = "latest"):
        """Restore into the structure of `state` (same model/optimizer)."""
        self.wait()
        path = self._path(tag)
        template = {
            "params": state.params,
            "opt_state": state.opt_state,
            "ema_params": state.ema_params,
            "step": state.step,
        }
        payload = self.checkpointer.restore(path, template)
        return state.replace(
            params=payload["params"],
            opt_state=payload["opt_state"],
            ema_params=payload["ema_params"],
            step=payload["step"],
        )

    def has(self, tag: str = "latest") -> bool:
        self.wait()
        return os.path.exists(self._path(tag))


def _key_str(entry) -> str:
    # normalise DictKey / GetAttrKey / SequenceKey to a plain path segment
    for attr in ("key", "name", "idx"):
        if hasattr(entry, attr):
            return str(getattr(entry, attr))
    return str(entry)


def parse_class_list(spec: str):
    """A class list from a YAML/JSON list file or a comma-separated string,
    SORTED — the reference sorts the old-classes yaml on load
    (``train_ddp.py:438`` \"we will sort them!\")."""
    if os.path.exists(spec):
        text = open(spec).read()
        try:
            import yaml

            classes = yaml.safe_load(text)
        except Exception:
            import json

            classes = json.loads(text)
        if isinstance(classes, dict):  # tolerate {'classes': [...]} wrappers
            classes = classes.get("classes")
        if not isinstance(classes, (list, tuple)):
            # guessing (e.g. values()[0] of a {name: index} mapping) would
            # silently yield a wrong class ordering for head surgery
            raise ValueError(
                f"{spec}: expected a YAML/JSON list of class names or a "
                "{'classes': [...]} mapping")
    else:
        classes = [c for c in spec.split(",") if c.strip()]
    return sorted(str(c).strip() for c in classes)


def load_pretrained_params(state, path: str, tag: str = "best",
                           old_classes=None, new_classes=None):
    """Non-strict transfer-learning load (reference ``model/utils.py:125-129``):
    copies leaves whose flattened path+shape match; everything else keeps its
    fresh init. Matching is by PATH, not tree structure, so checkpoints from
    older module layouts still donate every surviving parameter — and the log
    reports exactly how many leaves transferred (a silent zero-match load
    would otherwise masquerade as a successful warm start).

    With `old_classes` + `new_classes` (reference --update_output_layer
    --old_classes, ``train_ddp.py:437-438`` → ``update_output_layer_onk``),
    the output-head kernels are instead remapped class by class
    (`models/surgery.update_output_layers`), so a checkpoint trained on a
    different class list donates every class both lists share."""
    import logging

    logger = logging.getLogger("rsuper")
    ckpt_path = os.path.join(os.path.abspath(path), tag)
    try:
        raw = ocp.PyTreeCheckpointer().restore(ckpt_path)
        donor_params = raw["params"]
    except Exception as e:  # unreadable / not a checkpoint
        logger.warning(
            "pretrained load failed for %s (%s: %s) — keeping fresh init",
            ckpt_path, type(e).__name__, e,
        )
        return state

    if old_classes:
        from ..models.surgery import update_output_layers

        params = update_output_layers(
            state.params, donor_params, list(old_classes), list(new_classes),
        )
        params = jax.tree.map(
            lambda new, old: jax.numpy.asarray(old,
                                               getattr(new, "dtype", None)),
            state.params, params,
        )
        logger.info(
            "pretrained transfer from %s with class surgery: %d old -> %d "
            "new classes (%d shared)",
            ckpt_path, len(old_classes), len(new_classes),
            len(set(old_classes) & set(new_classes)),
        )
        return state.replace(params=params)

    donor = {
        "/".join(_key_str(k) for k in kp): v
        for kp, v in jax.tree_util.tree_flatten_with_path(donor_params)[0]
    }
    counts = {"matched": 0, "total": 0}

    def merge(kp, new):
        counts["total"] += 1
        old = donor.get("/".join(_key_str(k) for k in kp))
        if (
            old is not None
            and hasattr(old, "shape")
            and tuple(old.shape) == tuple(new.shape)
        ):
            counts["matched"] += 1
            return jax.numpy.asarray(old, getattr(new, "dtype", None))
        return new

    params = jax.tree_util.tree_map_with_path(merge, state.params)
    log = logger.warning if counts["matched"] == 0 else logger.info
    log(
        "pretrained transfer from %s: %d/%d param leaves matched by "
        "path+shape (non-strict)",
        ckpt_path, counts["matched"], counts["total"],
    )
    return state.replace(params=params)
