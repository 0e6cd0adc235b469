"""End-to-end slice (SURVEY.md §7 minimum slice, on synthetic data):
preprocess one NIfTI → dataset → training loop (loss decreases) →
sliding-window inference → Dice vs GT. Runs on the 8-device CPU mesh."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rsuper_tpu.config import load_config
from rsuper_tpu.data.dataset import Case, RSuperDataConfig, RSuperDataset
from rsuper_tpu.data.nifti import write_nifti
from rsuper_tpu.data.preprocess import preprocess_case, load_case
from rsuper_tpu.inference import sliding_window_inference
from rsuper_tpu.metrics import dice_score
from rsuper_tpu.models import get_model
from rsuper_tpu.train.loop import train

CLASSES = ["background", "pancreas", "pancreatic_lesion"]


def _make_synthetic_case(tmp_path, name="BDMAP_S"):
    """A CT with a bright cube 'organ' and a brighter 'lesion' inside."""
    rng = np.random.default_rng(0)
    ct = rng.normal(scale=30.0, size=(48, 48, 48)).astype(np.float32)
    organ = np.zeros((48, 48, 48), np.uint8)
    organ[12:36, 12:36, 12:36] = 1
    lesion = np.zeros_like(organ)
    lesion[20:28, 20:28, 20:28] = 1
    ct[organ > 0] += 120.0
    ct[lesion > 0] += 160.0
    aff = np.eye(4)
    write_nifti(str(tmp_path / "ct.nii.gz"), ct, aff)
    write_nifti(str(tmp_path / "organ.nii.gz"), organ, aff)
    write_nifti(str(tmp_path / "lesion.nii.gz"), lesion, aff)
    out = str(tmp_path / f"{name}.npz")
    preprocess_case(
        str(tmp_path / "ct.nii.gz"),
        {
            "background": None,
            "pancreas": str(tmp_path / "organ.nii.gz"),
            "pancreatic_lesion": str(tmp_path / "lesion.nii.gz"),
        },
        out,
        classes=CLASSES,
        min_size=(48, 48, 48),
    )
    return out


@pytest.mark.slow
def test_minimum_end_to_end_slice(tmp_path):
    npz = _make_synthetic_case(tmp_path)
    image, labels = load_case(npz)

    cfg = load_config(
        "abdomenatlas/resunet_3d",
        overrides=dict(
            classes=tuple(CLASSES),
            training_size=(32, 32, 32),
            batch_size=8,
            epochs=1,
            iter_per_epoch=6,
            base_lr=3e-3,
            warmup_epochs=0,
            report_volume_loss_basic=0.0,
            loss="dice",
            model_args=dict(base_chan=8, block="BasicBlock"),
            compute_dtype="float32",
            cp_path=str(tmp_path / "exp"),
            unique_name="e2e",
            num_workers=2,
            val_freq=0,
            scale=(0.0, 0.0, 0.0),
            rotate=(0.0, 0.0, 0.0),
        ),
    )
    dcfg = RSuperDataConfig(
        classes=tuple(CLASSES), report_classes=(),
        crop_size=(32, 32, 32), tumor_classes=("pancreas",),
    )
    dataset = RSuperDataset([Case("BDMAP_S", npz, False)], dcfg)
    model = get_model(cfg.arch, len(CLASSES), cfg.model_args, dtype=jnp.float32)

    state = train(cfg, model, dataset, max_steps=6)
    assert int(state.step) == 6
    # checkpoint written + metrics logged
    assert os.path.exists(str(tmp_path / "exp/e2e/latest"))
    assert os.path.exists(str(tmp_path / "exp/e2e/metrics.jsonl"))

    # sliding-window inference over the full volume
    def apply_fn(params, x):
        out = model.apply(params, x)["segmentation"]
        return out[0] if isinstance(out, (list, tuple)) else out

    probs = sliding_window_inference(
        apply_fn, state.params, image, len(CLASSES), window=(32, 32, 32), batch=2
    )
    assert probs.shape == image.shape + (len(CLASSES),)
    assert np.isfinite(probs).all() and probs.min() >= 0 and probs.max() <= 1
    # 6 steps is not convergence; just confirm the metric machinery runs
    d = dice_score(probs[..., 1] > 0.5, labels[1])
    assert 0.0 <= d <= 1.0


def test_sliding_window_blending_uniform():
    # constant-logit model -> blended probs constant everywhere incl. overlaps
    def apply_fn(params, x):
        return jnp.full(x.shape[:-1] + (2,), 1.2)

    vol = np.zeros((40, 36, 33), np.float32)
    probs = sliding_window_inference(apply_fn, None, vol, 2, window=(16, 16, 16),
                                     batch=3)
    expect = 1.0 / (1.0 + np.exp(-1.2))
    np.testing.assert_allclose(probs, expect, rtol=1e-5)


def test_sliding_window_organ_gating():
    def apply_fn(params, x):
        return jnp.full(x.shape[:-1] + (1,), 5.0)

    vol = np.zeros((48, 48, 48), np.float32)
    organ = np.zeros_like(vol)
    organ[:16, :16, :16] = 1
    probs = sliding_window_inference(
        apply_fn, None, vol, 1, window=(16, 16, 16), batch=2, organ_mask=organ
    )
    assert probs[:16, :16, :16].min() > 0.9
    assert probs[40:, 40:, 40:].max() == 0.0
