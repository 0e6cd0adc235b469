"""Output-layer class surgery for transfer learning across class lists.

Equivalent of the reference's ``update_output_layer_onk``
(``rsuper_train/model/dim3/medformer.py:224-320``): when fine-tuning a
checkpoint trained with a different class list, keep the per-class 1x1x1 conv
kernels (and biases) of classes present in both lists, optionally seeding new
classes from the pancreatic-lesion kernel; everything else keeps its fresh
initialisation.

Works on flax param pytrees: the class dimension is the LAST axis of the
``outc`` / ``aux_out`` conv kernels (channels-last models).
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np


def _remap_last_axis(new_arr, old_arr, old_classes, new_classes, copy_pancreas):
    new_arr = np.array(new_arr)
    old_arr = np.asarray(old_arr)
    old_idx = {c: i for i, c in enumerate(old_classes)}
    for j, cls in enumerate(new_classes):
        if cls in old_idx:
            new_arr[..., j] = old_arr[..., old_idx[cls]]
        elif copy_pancreas and "pancreatic_lesion" in old_idx:
            new_arr[..., j] = old_arr[..., old_idx["pancreatic_lesion"]]
    return new_arr


def update_output_layers(
    new_params,
    old_params,
    old_classes: Sequence[str],
    new_classes: Sequence[str],
    head_names: Sequence[str] = ("outc", "aux_out"),
    copy_pancreas: bool = False,
):
    """Return `new_params` with class-matched head kernels copied from
    `old_params`. Non-head parameters are copied wholesale when shapes match
    (standard transfer), so call this INSTEAD of a plain restore."""
    flat_new = dict(jax.tree_util.tree_flatten_with_path(new_params)[0])
    flat_old = dict(jax.tree_util.tree_flatten_with_path(old_params)[0])

    def path_str(path):
        return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)

    out = {}
    for path, new_leaf in flat_new.items():
        ps = path_str(path)
        old_leaf = flat_old.get(path)
        is_head = any(h in ps for h in head_names)
        if old_leaf is None:
            out[path] = new_leaf
        elif is_head and old_leaf.shape[:-1] == new_leaf.shape[:-1]:
            out[path] = _remap_last_axis(
                new_leaf, old_leaf, list(old_classes), list(new_classes),
                copy_pancreas,
            ).astype(np.asarray(new_leaf).dtype)
        elif old_leaf.shape == new_leaf.shape:
            out[path] = old_leaf
        else:
            out[path] = new_leaf

    treedef = jax.tree_util.tree_structure(new_params)
    leaves = [out[p] for p, _ in jax.tree_util.tree_flatten_with_path(new_params)[0]]
    return jax.tree_util.tree_unflatten(treedef, leaves)
