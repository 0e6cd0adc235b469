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
    np.testing.assert_allclose(probs, expect, rtol=1e-3)  # fp16 transfer
    # full-precision transfer on request
    probs32 = sliding_window_inference(apply_fn, None, vol, 2,
                                       window=(16, 16, 16), batch=3,
                                       out_dtype=np.float32)
    np.testing.assert_allclose(probs32, expect, rtol=1e-5)


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


@pytest.mark.slow
def test_report_supervision_learns_tumor():
    """The R-Super mechanism end-to-end: NO per-voxel tumor labels, only a
    report (volume+diameter in a segment) — after training, the lesion
    channel must light up inside the reported segment and stay dark outside.
    """
    from rsuper_tpu.losses import LesionChannelMap, LossConfig
    from rsuper_tpu.losses.ball import BallLossConfig
    from rsuper_tpu.models import get_model
    from rsuper_tpu.parallel import make_mesh, shard_batch
    from rsuper_tpu.train import build_train_step, create_train_state, make_optimizer

    classes = ["background", "pancreas", "pancreatic_lesion"]
    lmap = LesionChannelMap.from_classes(classes)
    B, S, C = 4, 24, 3
    rng = np.random.default_rng(0)
    # CT: bright blob where the tumor is (so the net CAN find it)
    img = rng.normal(size=(B, S, S, S, 1)).astype(np.float32) * 0.1
    img[:, 8:14, 8:14, 8:14, 0] += 2.0
    seg = np.zeros((B, S, S, S, C), np.float32)
    seg[:, 6:18, 6:18, 6:18, 2] = 1.0  # reported segment (lesion channel)
    lab = np.zeros_like(seg)
    lab[:, 6:18, 6:18, 6:18, 1] = 1.0  # organ label
    vols = np.zeros((B, 10), np.float32)
    vols[:, 0] = 200.0
    dias = np.zeros((B, 10, 3), np.float32)
    dias[:, 0] = [7.0, 7.0, 7.0]
    batch = {
        "image": jnp.asarray(img), "label": jnp.asarray(lab),
        "unk": jnp.asarray(seg.copy()), "segment_mask": jnp.asarray(seg),
        "volumes": jnp.asarray(vols), "diameters": jnp.asarray(dias),
    }

    mesh = make_mesh(jax.devices()[:4])
    model = get_model("resunet", C, {"base_chan": 4}, dtype=jnp.float32)
    tx = make_optimizer(base_lr=3e-3, warmup_epochs=0, max_epochs=100,
                        steps_per_epoch=10)
    state = create_train_state(model, jax.random.PRNGKey(0), batch["image"][:1], tx)
    cfg = LossConfig(loss="ball", ball_max_diameter=16)
    step = build_train_step(model, lmap, cfg, mesh=mesh)
    batch = shard_batch(batch, mesh)
    for _ in range(60):
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["overall"]))

    # The ball loss's contract: the lesion channel ends up with roughly the
    # REPORTED tumor volume of confident voxels inside the reported segment
    # (the exact position bootstraps from the net's own output — with real
    # data the image correlation across cases pins it down), and stays dark
    # outside the segment where plain BCE-to-zero applies.
    out = model.apply(state.params, batch["image"])["segmentation"]
    probs = np.asarray(jax.nn.sigmoid(out[..., 2]))
    seg_sp = seg[..., 2] > 0
    inside_hot = int(((probs > 0.5) & seg_sp).sum()) / B
    total_hot = int((probs > 0.5).sum()) / B
    # reported volume 200 (small/big margins 160..240): confident mass of
    # about that size appears inside the segment; hot voxels outside it may
    # only live in the unpenalised border ring around the pseudo-mask
    # (reference :1729-1737), so the total stays bounded...
    assert 60 <= inside_hot <= 900, f"hot voxels in segment: {inside_hot}"
    assert total_hot <= 2000, f"hot voxels exploded: {total_hot}"
    # ...and the far corner (outside segment + ring reach) stays dark
    assert (probs[:, :3, :3, :3] > 0.5).sum() == 0
    assert probs[:, 6:18, 6:18, 6:18].mean() > 10 * probs[:, :3, :3, :3].mean()


def test_sliding_window_gaussian_blend():
    def apply_fn(params, x):
        return jnp.full(x.shape[:-1] + (1,), 1.2)

    vol = np.zeros((32, 32, 32), np.float32)
    probs = sliding_window_inference(apply_fn, None, vol, 1, window=(16, 16, 16),
                                     batch=2, blend="gaussian")
    expect = 1.0 / (1.0 + np.exp(-1.2))
    np.testing.assert_allclose(probs, expect, rtol=1e-4)
