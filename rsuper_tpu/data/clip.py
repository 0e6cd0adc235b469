"""CLIP-pretraining data support: report embeddings per case.

The reference precomputes Clinical-Longformer embeddings of each report into
a directory consumed via ``--clip_source`` (``train_ddp.py:450-451``), pairs
them with organ-homogeneous CT-crop batches (``sampler_clip.py``), and trains
with symmetric InfoNCE (``losses/info_nce.py``).

`embed_reports` uses the HF transformers stack (torch CPU) to produce the
embeddings; `ClipRecordAdapter` attaches them to training records.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

DEFAULT_ENCODER = "yikuan8/Clinical-Longformer"


def embed_reports(
    reports: Dict[str, str],
    out_dir: str,
    model_name: str = DEFAULT_ENCODER,
    batch_size: int = 4,
    max_length: int = 2048,
) -> None:
    """{case_id: report text} → one L2-normalised mean-pooled embedding .npy
    per case (resumable: existing files are skipped)."""
    import torch
    from transformers import AutoModel, AutoTokenizer

    os.makedirs(out_dir, exist_ok=True)
    todo = {k: v for k, v in reports.items()
            if not os.path.exists(os.path.join(out_dir, f"{k}.npy"))}
    if not todo:
        return
    tok = AutoTokenizer.from_pretrained(model_name)
    model = AutoModel.from_pretrained(model_name)
    model.eval()
    ids = list(todo)
    with torch.no_grad():
        for i in range(0, len(ids), batch_size):
            chunk = ids[i : i + batch_size]
            enc = tok([todo[c] for c in chunk], padding=True, truncation=True,
                      max_length=max_length, return_tensors="pt")
            out = model(**enc).last_hidden_state  # (B, L, H)
            mask = enc["attention_mask"][..., None].float()
            emb = (out * mask).sum(1) / mask.sum(1).clamp(min=1)
            emb = torch.nn.functional.normalize(emb, dim=-1).numpy()
            for c, e in zip(chunk, emb):
                np.save(os.path.join(out_dir, f"{c}.npy"), e.astype(np.float32))


class ReportEmbeddingStore:
    def __init__(self, directory: str):
        self.directory = directory

    def get(self, case_id: str) -> Optional[np.ndarray]:
        path = os.path.join(self.directory, f"{case_id}.npy")
        return np.load(path) if os.path.exists(path) else None


class ClipRecordAdapter:
    """Wraps a dataset so each record carries its report embedding."""

    def __init__(self, dataset, store: ReportEmbeddingStore, dim: int = 768):
        self.dataset = dataset
        self.store = store
        self.dim = dim

    def __len__(self):
        return len(self.dataset)

    @property
    def cases(self):
        return self.dataset.cases

    def crop_organs(self):
        return self.dataset.crop_organs()

    def sample(self, index: int, rng=None):
        rec = self.dataset.sample(index, rng)
        case = self.dataset.cases[index % len(self.dataset.cases)]
        emb = self.store.get(case.case_id)
        rec["report_embedding"] = (
            emb.astype(np.float32) if emb is not None
            else np.zeros((self.dim,), np.float32)
        )
        return rec
