"""Offline-augmentation daemon + class-surgery tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rsuper_tpu.data.augment_daemon import (
    AugmentedRecordDataset,
    load_record,
    run_daemon,
    save_record,
)
from rsuper_tpu.models import get_model
from rsuper_tpu.models.surgery import update_output_layers


def test_save_load_record_roundtrip(tmp_path):
    rec = {
        "image": np.random.default_rng(0).normal(size=(16, 16, 16)).astype(np.float32),
        "label": (np.random.default_rng(1).random((3, 16, 16, 16)) > 0.5).astype(np.uint8),
        "unk": np.zeros((3, 16, 16, 16), np.uint8),
        "segment_mask": np.zeros((3, 16, 16, 16), np.uint8),
        "volumes": np.zeros(10, np.float32),
        "diameters": np.zeros((10, 3), np.float32),
        "apply_affine": np.float32(0.0),
    }
    save_record(rec, str(tmp_path), "BDMAP_T")
    back = load_record(str(tmp_path), "BDMAP_T")
    np.testing.assert_array_equal(back["label"], rec["label"])
    np.testing.assert_allclose(back["image"], rec["image"])
    assert float(back["apply_affine"]) == 0.0


def test_daemon_and_loader(tmp_path):
    from tests.test_data import CLASSES, _cfg, _make_mask_case
    from rsuper_tpu.data.dataset import Case, RSuperDataset

    cases = [Case(*_make_mask_case(tmp_path), False)]
    ds = RSuperDataset(cases, _cfg())
    run_daemon(ds, str(tmp_path / "aug"), max_rounds=1)
    loader_ds = AugmentedRecordDataset(ds, str(tmp_path / "aug"))
    rec = loader_ds.sample(0)
    assert rec["label"].shape[0] == len(CLASSES)
    # missing file -> falls back to online sampling without raising
    loader_missing = AugmentedRecordDataset(ds, str(tmp_path / "nope"))
    rec2 = loader_missing.sample(0)
    assert rec2["image"].shape == rec["image"].shape


def test_update_output_layers_keeps_matching_classes():
    old_classes = ["background", "liver", "pancreatic_lesion"]
    new_classes = ["background", "kidney_lesion", "liver", "pancreatic_lesion"]
    x = jnp.ones((1, 8, 8, 8, 1))
    m_old = get_model("resunet", len(old_classes), {"base_chan": 4},
                      dtype=jnp.float32)
    m_new = get_model("resunet", len(new_classes), {"base_chan": 4},
                      dtype=jnp.float32)
    p_old = m_old.init(jax.random.PRNGKey(0), x)
    p_new = m_new.init(jax.random.PRNGKey(1), x)

    merged = update_output_layers(p_new, p_old, old_classes, new_classes,
                                  copy_pancreas=True)

    def head_kernel(p):
        return np.asarray(p["params"]["outc"]["kernel"])

    ko, kn = head_kernel(p_old), head_kernel(merged)
    # matching classes copied to their new positions
    np.testing.assert_allclose(kn[..., 0], ko[..., 0])  # background
    np.testing.assert_allclose(kn[..., 2], ko[..., 1])  # liver
    np.testing.assert_allclose(kn[..., 3], ko[..., 2])  # pancreatic_lesion
    # new class seeded from pancreatic_lesion (copy_pancreas)
    np.testing.assert_allclose(kn[..., 1], ko[..., 2])
    # body weights transferred wholesale
    bo = np.asarray(p_old["params"]["DownBlock_0"]["BasicBlock_0"]
                    ["ConvNormAct_0"]["Conv_0"]["kernel"])
    bn = np.asarray(merged["params"]["DownBlock_0"]["BasicBlock_0"]
                    ["ConvNormAct_0"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(bn, bo)


def test_load_pretrained_params_matches_by_path(tmp_path):
    """Non-strict transfer (checkpoint.load_pretrained_params): leaves match
    by flattened path+shape across DIFFERENT param-tree structures, so a
    module rename (e.g. the DepthwiseConv3 refactor renumbering flax
    siblings) degrades to a partial transfer instead of a silent full
    fallback to fresh init (reference model/utils.py:125-129 non-strict)."""
    import optax

    from rsuper_tpu.train.checkpoint import (
        CheckpointManager,
        load_pretrained_params,
    )
    from rsuper_tpu.train.state import TrainState

    rng = np.random.default_rng(0)
    donor_params = {"params": {
        "Conv_0": {"kernel": jnp.asarray(rng.normal(size=(3, 3)), jnp.float32)},
        "Old_0": {"kernel": jnp.asarray(rng.normal(size=(4, 4)), jnp.float32)},
        "Head": {"bias": jnp.asarray(rng.normal(size=(7,)), jnp.float32)},
    }}
    tx = optax.sgd(0.1)
    donor = TrainState(params=donor_params, opt_state=tx.init(donor_params),
                       ema_params=None, step=jnp.zeros((), jnp.int32), tx=tx)
    mgr = CheckpointManager(str(tmp_path / "ck"), synchronous=True)
    mgr._save("best", donor)
    mgr.wait()

    fresh = {"params": {
        "Conv_0": {"kernel": jnp.zeros((3, 3), jnp.float32)},   # path+shape match
        "New_0": {"kernel": jnp.zeros((4, 4), jnp.float32)},    # renamed: no match
        "Head": {"bias": jnp.zeros((5,), jnp.float32)},         # shape mismatch
    }}
    state = TrainState(params=fresh, opt_state=tx.init(fresh),
                       ema_params=None, step=jnp.zeros((), jnp.int32), tx=tx)
    out = load_pretrained_params(state, str(tmp_path / "ck"), tag="best")

    np.testing.assert_allclose(out.params["params"]["Conv_0"]["kernel"],
                               donor_params["params"]["Conv_0"]["kernel"])
    assert float(jnp.abs(out.params["params"]["New_0"]["kernel"]).max()) == 0.0
    assert out.params["params"]["Head"]["bias"].shape == (5,)
    assert float(jnp.abs(out.params["params"]["Head"]["bias"]).max()) == 0.0

    # unreadable path: warn + keep fresh init, never raise
    out2 = load_pretrained_params(state, str(tmp_path / "nope"), tag="best")
    assert out2 is state


def test_load_pretrained_params_class_surgery(tmp_path):
    """--pretrained + --old_classes end-to-end (reference
    --update_output_layer --old_classes, train_ddp.py:437-438): the donor
    checkpoint's head kernels are remapped class by class through
    checkpoint.load_pretrained_params, and parse_class_list sorts its input
    like the reference does."""
    import optax

    from rsuper_tpu.train.checkpoint import (
        CheckpointManager,
        load_pretrained_params,
        parse_class_list,
    )
    from rsuper_tpu.train.state import TrainState

    assert parse_class_list("liver,background") == ["background", "liver"]
    yml = tmp_path / "old.yaml"
    yml.write_text("- liver\n- background\n- pancreatic_lesion\n")
    old_classes = parse_class_list(str(yml))
    assert old_classes == ["background", "liver", "pancreatic_lesion"]

    new_classes = ["background", "kidney_lesion", "liver",
                   "pancreatic_lesion"]
    x = jnp.ones((1, 8, 8, 8, 1))
    m_old = get_model("resunet", len(old_classes), {"base_chan": 4},
                      dtype=jnp.float32)
    m_new = get_model("resunet", len(new_classes), {"base_chan": 4},
                      dtype=jnp.float32)
    p_old = m_old.init(jax.random.PRNGKey(0), x)
    p_new = m_new.init(jax.random.PRNGKey(1), x)

    tx = optax.sgd(0.1)
    donor = TrainState(params=p_old, opt_state=tx.init(p_old),
                       ema_params=None, step=jnp.zeros((), jnp.int32), tx=tx)
    mgr = CheckpointManager(str(tmp_path / "ck"), synchronous=True)
    mgr._save("best", donor)
    mgr.wait()

    state = TrainState(params=p_new, opt_state=tx.init(p_new),
                       ema_params=None, step=jnp.zeros((), jnp.int32), tx=tx)
    out = load_pretrained_params(state, str(tmp_path / "ck"), tag="best",
                                 old_classes=old_classes,
                                 new_classes=new_classes)

    ko = np.asarray(p_old["params"]["outc"]["kernel"])
    kn = np.asarray(out.params["params"]["outc"]["kernel"])
    np.testing.assert_allclose(kn[..., 0], ko[..., 0])  # background
    np.testing.assert_allclose(kn[..., 2], ko[..., 1])  # liver
    np.testing.assert_allclose(kn[..., 3], ko[..., 2])  # pancreatic_lesion
    # the novel class keeps its fresh init (copy_pancreas off by default)
    np.testing.assert_allclose(
        kn[..., 1], np.asarray(p_new["params"]["outc"]["kernel"])[..., 1])
    # body weights transfer wholesale
    np.testing.assert_allclose(
        np.asarray(out.params["params"]["DownBlock_0"]["BasicBlock_0"]
                   ["ConvNormAct_0"]["Conv_0"]["kernel"]),
        np.asarray(p_old["params"]["DownBlock_0"]["BasicBlock_0"]
                   ["ConvNormAct_0"]["Conv_0"]["kernel"]))
