"""Static lesion-channel mapping.

The reference merges output channels belonging to the same organ's lesion
classes by scanning class-name substrings at every loss call
(``rsuper_train/training/losses_foundation.py:204-248`` ``get_lesion_channels``):
channels whose name contains one of the suffixes {lesion, cyst, pdac, pnet}
are grouped by their ``<organ>_<suffix>`` prefix (with ``pancreatic`` →
``pancreas``) and reduced with an elementwise max.

TPU-first redesign: the name scan runs **once on the host** at configuration
time and is frozen into a static index structure; inside jit the merge is a
static gather + max over the channel (lane) axis.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax.numpy as jnp

LESION_SUFFIXES = ("lesion", "cyst", "pdac", "pnet")


def _group_name(cls: str, suffix: str) -> str:
    name = cls[: cls.index("_" + suffix) + len("_" + suffix)]
    return name.replace("pancreatic", "pancreas")


@dataclasses.dataclass(frozen=True)
class LesionChannelMap:
    """Frozen mapping from full class channels (C) to merged lesion channels (L)."""

    classes: Tuple[str, ...]
    lesion_names: Tuple[str, ...]
    groups: Tuple[Tuple[int, ...], ...]  # per lesion channel: source class indices

    @classmethod
    def from_classes(cls, classes: Sequence[str]) -> "LesionChannelMap":
        classes = tuple(classes)
        names: list[str] = []
        groups: dict[str, list[int]] = {}
        for i, c in enumerate(classes):
            for suffix in LESION_SUFFIXES:
                if suffix in c:
                    name = _group_name(c, suffix)
                    if name not in groups:
                        groups[name] = []
                        names.append(name)
                    groups[name].append(i)
        return cls(
            classes=classes,
            lesion_names=tuple(names),
            groups=tuple(tuple(groups[n]) for n in names),
        )

    @property
    def num_lesion_channels(self) -> int:
        return len(self.lesion_names)

    def merge(self, x):
        """(..., C) -> (..., L) by max over each lesion group (static gather)."""
        assert x.shape[-1] == len(self.classes), (
            f"expected {len(self.classes)} channels, got {x.shape[-1]}"
        )
        cols = [
            jnp.max(x[..., list(idxs)], axis=-1) for idxs in self.groups
        ]
        return jnp.stack(cols, axis=-1)

    def lesion_class_indices(self) -> Tuple[int, ...]:
        """Channels whose class name contains 'lesion' (classification loss
        semantics, ``losses_foundation.py:634``)."""
        return tuple(i for i, c in enumerate(self.classes) if "lesion" in c)
