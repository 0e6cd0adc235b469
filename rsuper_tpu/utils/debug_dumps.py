"""Counter-gated NIfTI sanity dumps.

The reference saves the first ~10 batches of every intermediate (labels,
known/unk masks, chosen segment, ball-loss pseudo-masks, per-voxel BCE maps)
as nii.gz for visual inspection (SURVEY.md §4.2: ``SanityBallLoss/``,
``LossChecking/``, ``SanityOutputs/``, ``DatasetSanity/`` dirs;
``losses_foundation.py:1078`` ``debug_save_labels``). Same capability here as
an explicit host-side utility — jit-compatible by running on fetched arrays.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

from ..data.nifti import write_nifti


class SanityDumper:
    """Dump the first `limit` calls' tensors as per-channel NIfTIs."""

    def __init__(self, out_dir: str = "./SanityCheck", limit: int = 10):
        self.out_dir = out_dir
        self.limit = limit
        self.counter = 0

    def dump(
        self,
        tensors: Dict[str, np.ndarray],
        class_names: Optional[Sequence[str]] = None,
        batch_idx: int = 0,
    ):
        """tensors: {name: array} with arrays (B, D, H, W, C) / (B, D, H, W)
        channels-last (device or host). No-op once the limit is reached."""
        if self.counter >= self.limit:
            return
        sub = os.path.join(self.out_dir, str(self.counter))
        os.makedirs(sub, exist_ok=True)
        for name, arr in tensors.items():
            arr = np.asarray(arr)
            if arr.ndim == 4:  # (B, D, H, W)
                arr = arr[..., None]
            vol = arr[batch_idx]
            C = vol.shape[-1]
            for c in range(C):
                ch = vol[..., c].astype(np.float32)
                if C > 1 and not ch.any():
                    continue  # skip empty channels like the reference
                label = (class_names[c] if class_names and c < len(class_names)
                         else str(c))
                write_nifti(os.path.join(sub, f"{name}_{label}.nii.gz"), ch)
        self.counter += 1
