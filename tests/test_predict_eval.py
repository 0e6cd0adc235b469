"""Predict CLI postprocessing + detection/eval harness tests."""

import os

import numpy as np
import pandas as pd
import pytest

from rsuper_tpu.eval.detection import detect_volumes, detection_table
from rsuper_tpu.eval.sens_spec import (
    best_f1,
    evaluate_detection,
    load_ground_truth,
    prob_auc,
    sensitivity_specificity_f1,
)
from rsuper_tpu.data.nifti import write_nifti
from rsuper_tpu.inference.predict import (
    keep_largest_component,
    organ_mask_for_lesion,
    postprocess_prediction,
    predict_volume,
    restore_geometry,
    preprocess_volume,
)

CLASSES = ["kidney_left", "kidney_right", "pancreas", "pancreatic_lesion",
           "kidney_lesion"]


def test_postprocess_organ_gating():
    S = 32
    probs = np.zeros((S, S, S, len(CLASSES)), np.float32)
    probs[..., CLASSES.index("pancreas")][8:16, 8:16, 8:16] = 0.9
    # lesion predicted inside + far outside the pancreas
    li = CLASSES.index("pancreatic_lesion")
    probs[10:14, 10:14, 10:14, li] = 0.9
    probs[25:30, 25:30, 25:30, li] = 0.9
    masks = postprocess_prediction(probs, CLASSES)
    assert masks["pancreatic_lesion"][11, 11, 11] == 1
    assert masks["pancreatic_lesion"][27, 27, 27] == 0  # gated away
    # kidney lesion uses left+right union
    probs2 = np.zeros_like(probs)
    probs2[..., CLASSES.index("kidney_left")][2:6, 2:6, 2:6] = 0.9
    probs2[..., CLASSES.index("kidney_lesion")][3:5, 3:5, 3:5] = 0.9
    masks2 = postprocess_prediction(probs2, CLASSES)
    assert masks2["kidney_lesion"].sum() > 0


def test_keep_largest_component():
    m = np.zeros((20, 20, 20), np.uint8)
    m[2:10, 2:10, 2:10] = 1
    m[15:17, 15:17, 15:17] = 1
    out = keep_largest_component(m)
    assert out[3, 3, 3] == 1 and out[16, 16, 16] == 0


def test_organ_mask_routing():
    masks = {"kidney_left": np.ones((4, 4, 4)), "kidney_right": np.zeros((4, 4, 4)),
             "prostate": np.ones((4, 4, 4))}
    assert organ_mask_for_lesion("kidney_lesion", masks).sum() == 64
    assert organ_mask_for_lesion("uterus_lesion", masks).sum() == 64
    assert organ_mask_for_lesion("bone_lesion", masks).sum() == 64


def test_predict_volume_z_chunking():
    import jax.numpy as jnp

    def apply_fn(params, x):
        return jnp.full(x.shape[:-1] + (1,), 3.0)

    import rsuper_tpu.inference.predict as P
    old = P.Z_CHUNK
    P.Z_CHUNK = 24
    try:
        vol = np.zeros((60, 16, 16), np.float32)
        probs = predict_volume([apply_fn], [None], vol, 1, window=(16, 16, 16),
                               batch=2)
    finally:
        P.Z_CHUNK = old
    expect = 1.0 / (1.0 + np.exp(-3.0))
    np.testing.assert_allclose(probs[..., 0], expect, rtol=1e-3)  # fp16 transfer


def test_preprocess_restore_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    ct = rng.normal(size=(24, 20, 16)).astype(np.float32) * 100
    aff = np.diag([2.0, 2.0, 2.0, 1.0])
    p = str(tmp_path / "ct.nii.gz")
    write_nifti(p, ct, aff)
    vol, meta = preprocess_volume(p, min_size=(16, 16, 16))
    assert vol.shape == (48, 40, 32)
    mask = np.ones(vol.shape, np.uint8)
    back = restore_geometry(mask, meta)
    assert back.shape == ct.shape
    assert back.mean() > 0.9


# ----------------------------------------------------------------- detection
def test_detect_volumes_denoise():
    prob = np.zeros((30, 30, 30), np.float32)
    prob[5:15, 5:15, 5:15] = 0.7  # solid blob: survives erosion
    prob[20, 20, 20] = 0.95  # single-voxel noise: eroded away
    det = detect_volumes(prob)
    assert det["max_prob"] == pytest.approx(0.95)
    assert det["volumes"][0.5] == 1000  # blob only (10^3), noise removed
    assert det["volumes"][0.8] == 0


def test_detection_table_and_eval(tmp_path):
    # two cases: one with a pancreatic lesion blob, one clean
    for case, has in [("BDMAP_X", True), ("BDMAP_Y", False)]:
        d = tmp_path / case
        d.mkdir()
        prob = np.zeros((24, 24, 24), np.float32)
        if has:
            prob[4:12, 4:12, 4:12] = 0.8
        write_nifti(str(d / "pancreatic_lesion_prob.nii.gz"), prob, np.eye(4))
    tables = detection_table(str(tmp_path), organs=("pancreatic",))
    df = tables[0.5]
    assert set(df.BDMAP_ID) == {"BDMAP_X", "BDMAP_Y"}
    vx = df[df.BDMAP_ID == "BDMAP_X"]["pancreatic tumor volume predicted"].iloc[0]
    assert vx > 100

    gt = pd.DataFrame({
        "BDMAP_ID": ["BDMAP_X", "BDMAP_Y"],
        "gt_pancreatic": [1.0, 0.0],
    })
    ev = evaluate_detection(gt, tables, organs=("pancreatic",),
                            volume_thresholds=(10.0, 1e6))
    df5 = ev[0.5]
    r = df5[df5.threshold == 10.0].iloc[0]
    assert r["pancreatic_sens"] == 1.0 and r["pancreatic_spec"] == 1.0
    assert r["pancreatic_f1"] == 1.0
    assert r["pancreatic_auc_prob"] == 1.0
    best = best_f1(ev, "pancreatic")
    assert best["f1"] == 1.0


def test_detection_parts_merge_identical(tmp_path):
    """A two-part sharded evaluate run must merge into exactly the one-part
    table (reference eval_AUC.py ProcessPool+FileLock sharding :321,12-30)."""
    from rsuper_tpu.eval.detection import (
        merge_detection_parts,
        write_detection_parts,
    )

    pred = tmp_path / "preds"; pred.mkdir()
    out = tmp_path / "eval"; out.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):
        d = pred / f"BDMAP_{i}"
        d.mkdir()
        prob = (rng.random((12, 12, 12)) * (i % 2)).astype(np.float32)
        write_nifti(str(d / "pancreatic_lesion_prob.nii.gz"), prob, np.eye(4))

    full = detection_table(str(pred), organs=("pancreatic",))
    for part in range(2):
        t = detection_table(str(pred), organs=("pancreatic",),
                            parts=2, part=part)
        write_detection_parts(str(out), t, 2, part)
        merged = merge_detection_parts(str(out), 2)
        if part == 0:
            assert merged is None  # incomplete → no canonical files yet
    assert merged is not None
    for th, df in full.items():
        pd.testing.assert_frame_equal(
            merged[th],
            df.sort_values("BDMAP_ID").reset_index(drop=True),
        )
        assert (out / f"tumor_detection_results_th{th}.csv").exists()


def test_device_postprocess_packed_matches_host():
    """The on-device threshold+organ-gate+bit-pack path must reproduce the
    host postprocess exactly (the packed uint8 transfer is the 32x D2H cut)."""
    import jax.numpy as jnp

    from rsuper_tpu.inference.predict import (
        device_postprocess_packed,
        postprocess_prediction,
        predict_masks_volume,
        unpack_masks,
    )

    classes = ("background", "kidney_left", "kidney_right", "kidney_lesion",
               "liver", "liver_lesion", "pancreas", "pancreatic_lesion",
               "spleen")
    rng = np.random.default_rng(0)
    probs = rng.uniform(size=(24, 24, 24, len(classes))).astype(np.float32)
    # concentrated organs so gating actually carves the lesions
    probs[..., classes.index("pancreas")] = 0.0
    probs[4:12, 4:12, 4:12, classes.index("pancreas")] = 0.9
    host = postprocess_prediction(probs, classes, organ_dilation=3)
    packed = np.asarray(device_postprocess_packed(jnp.asarray(probs), classes))
    assert packed.shape == (24, 24, 24, 2)  # 9 classes -> 2 uint8 words
    dev = unpack_masks(packed, classes)
    for cls in classes:
        np.testing.assert_array_equal(dev[cls], host[cls], err_msg=cls)

    # end-to-end ensemble path: identical models -> same masks as one model
    def apply_fn(params, x):
        out = jnp.zeros((x.shape[0], *x.shape[1:4], len(classes)), jnp.float32)
        return out.at[..., classes.index("spleen")].set(5.0 * x[..., 0])

    vol = (rng.uniform(size=(24, 24, 24)) > 0.5).astype(np.float32)
    masks = predict_masks_volume([apply_fn, apply_fn], [None, None], vol,
                                 classes, window=(16, 16, 16), batch=2)
    expect = (1 / (1 + np.exp(-5.0 * vol)) > 0.5).astype(np.uint8)
    np.testing.assert_array_equal(masks["spleen"], expect)


def test_detection_table_nnunet(tmp_path):
    """Flat nnU-Net npz probability stacks: plain threshold volumes, fixed
    tumor channels, no denoise (reference eval_AUC_nnunet.py)."""
    from rsuper_tpu.eval.detection import NNUNET_TUMOUR_CH, detection_table_nnunet

    C = 18
    for case, has in [("BDMAP_X", True), ("BDMAP_Y", False)]:
        probs = np.zeros((C, 16, 16, 16), np.float32)
        if has:
            probs[NNUNET_TUMOUR_CH["pancreatic"], 4:8, 4:8, 4:8] = 0.8
            probs[NNUNET_TUMOUR_CH["kidney"], 10, 10, 10] = 0.6  # lone voxel KEPT
        np.savez_compressed(tmp_path / f"{case}.npz", probabilities=probs)
    tables = detection_table_nnunet(str(tmp_path))
    df = tables[0.5]
    assert set(df.BDMAP_ID) == {"BDMAP_X", "BDMAP_Y"}
    x = df[df.BDMAP_ID == "BDMAP_X"].iloc[0]
    assert x["pancreatic tumor volume predicted"] == 64
    assert x["kidney tumor volume predicted"] == 1  # no erosion in this variant
    assert x["pancreatic tumor maximum probability"] == pytest.approx(0.8)
    assert df[df.BDMAP_ID == "BDMAP_Y"].iloc[0]["liver tumor volume predicted"] == 0
    # threshold above the blob prob -> volume 0
    assert tables[0.9][tables[0.9].BDMAP_ID == "BDMAP_X"].iloc[0][
        "pancreatic tumor volume predicted"] == 0
    # case subsetting + parts sharding
    only_x = detection_table_nnunet(str(tmp_path), case_ids=["BDMAP_X"])
    assert set(only_x[0.5].BDMAP_ID) == {"BDMAP_X"}


def test_sens_spec_f1_math():
    gt = np.array([1, 1, 0, 0])
    vols = np.array([100.0, 5.0, 200.0, 1.0])
    m = sensitivity_specificity_f1(gt, vols, 50.0)
    assert m["sens"] == 0.5 and m["spec"] == 0.5
    assert m["f1"] == pytest.approx(0.5)


def test_load_ground_truth(tmp_path):
    df = pd.DataFrame({
        "BDMAP ID": ["a", "b"],
        "number of liver lesion instances": [2, 0],
        "number of pancreatic lesion instances": [0, 1],
        "number of kidney lesion instances": [np.nan, 3],
    })
    p = str(tmp_path / "gt.csv")
    df.to_csv(p, index=False)
    gt = load_ground_truth(p)
    assert gt.loc[0, "gt_liver"] == 1 and gt.loc[1, "gt_liver"] == 0
    assert gt.loc[0, "gt_kidney"] == 0


def test_sliding_window_2d():
    import jax.numpy as jnp
    from rsuper_tpu.inference.sliding_window2d import sliding_window_inference_2d

    def apply_fn(params, x):
        return jnp.full(x.shape[:-1] + (2,), 1.2)

    vol = np.zeros((5, 40, 36), np.float32)
    probs = sliding_window_inference_2d(apply_fn, None, vol, 2, window=(16, 16),
                                        batch=4)
    expect = 1.0 / (1.0 + np.exp(-1.2))
    assert probs.shape == (5, 40, 36, 2)
    np.testing.assert_allclose(probs, expect, rtol=1e-5)


def test_detection_from_binary_masks(tmp_path):
    from rsuper_tpu.eval.detection import (
        detect_volume_from_mask,
        detection_table_from_masks,
    )

    d = tmp_path / "BDMAP_Z"
    d.mkdir()
    mask = np.zeros((20, 20, 20), np.uint8)
    mask[4:12, 4:12, 4:12] = 1
    write_nifti(str(d / "pancreatic_lesion.nii.gz"), mask, np.eye(4))
    assert detect_volume_from_mask(mask) == 512
    df = detection_table_from_masks(str(tmp_path), organs=("pancreatic",))
    assert df.iloc[0]["pancreatic tumor volume predicted"] == 512


def test_validate_cases():
    import jax.numpy as jnp
    from rsuper_tpu.train.validation import validate_cases

    D = 24
    target = np.zeros((2, D, D, D), np.uint8)
    target[1, 6:18, 6:18, 6:18] = 1

    def apply_fn(params, x):  # predicts exactly the cube on channel 1
        logits = np.full((x.shape[0], *x.shape[1:4], 2), -10.0, np.float32)
        return jnp.asarray(logits).at[..., 1].set(10.0)

    # constant prediction of "everything is class 1"
    res = validate_cases(apply_fn, None, [(np.zeros((D, D, D), np.float32),
                                           target)], 2,
                         window=(16, 16, 16), compute_distances=True, batch=2)
    # class 0 absent from GT -> not counted; class 1 dice = 2*V/(V+D^3)
    v = 12**3
    want = 2 * v / (v + D**3)
    assert res["cases_per_class"][1] == 1 and res["cases_per_class"][0] == 0
    assert res["dice"][1] == pytest.approx(want, rel=1e-3)
    assert res["hd95"][1] > 0


def test_predict_masks_prob_channels_parity():
    """prob_channels rides the same device accumulator: the returned f16
    lesion probabilities must match predict_volume's full float path, and
    the masks must be identical with/without the extra transfer."""
    import jax.numpy as jnp
    from rsuper_tpu.inference.predict import (predict_masks_volume,
                                              predict_volume)

    vol = np.zeros((20, 20, 20), np.float32)
    vol[4:12, 4:12, 4:12] = 1.0
    vol[6:9, 6:9, 6:9] = 2.0
    classes = ["pancreas", "pancreatic_lesion"]

    def apply_fn(params, x):
        organ = jnp.where(x[..., 0] > 0.1, 10.0, -10.0)
        lesion = jnp.where(x[..., 0] > 1.2, 10.0, -10.0)
        return jnp.stack([organ, lesion], axis=-1)

    masks_only = predict_masks_volume([apply_fn], [None], vol, classes,
                                      window=(16, 16, 16), batch=2)
    masks, probs = predict_masks_volume([apply_fn], [None], vol, classes,
                                        window=(16, 16, 16), batch=2,
                                        prob_channels=[1], prob_wire="f16")
    assert probs.dtype == np.float16 and probs.shape == vol.shape + (1,)
    for cls in classes:
        np.testing.assert_array_equal(masks[cls], masks_only[cls])
    full = predict_volume([apply_fn], [None], vol, 2,
                          window=(16, 16, 16), batch=2)
    np.testing.assert_allclose(probs[..., 0], full[..., 1], atol=2e-3)

    # the u8 wire default: half the D2H payload, error bounded by 1/510
    masks_u8, probs_u8 = predict_masks_volume(
        [apply_fn], [None], vol, classes, window=(16, 16, 16), batch=2,
        prob_channels=[1], prob_wire="u8")
    assert probs_u8.dtype == np.float16
    for cls in classes:
        np.testing.assert_array_equal(masks_u8[cls], masks_only[cls])
    np.testing.assert_allclose(probs_u8[..., 0], full[..., 1],
                               atol=1 / 510 + 2e-3)
    with pytest.raises(ValueError):
        predict_masks_volume([apply_fn], [None], vol, classes,
                             window=(16, 16, 16), batch=2,
                             prob_channels=[1], prob_wire="f32")


def test_predict_folder_end_to_end(tmp_path):
    import jax.numpy as jnp
    from rsuper_tpu.data.nifti import read_nifti
    from rsuper_tpu.inference.predict import predict_folder

    # two tiny CTs with a bright blob (organ) and a brighter core (lesion)
    for name in ("BDMAP_P1", "BDMAP_P2"):
        ct = np.zeros((20, 20, 20), np.float32)
        ct[4:12, 4:12, 4:12] = 400.0
        ct[6:9, 6:9, 6:9] = 500.0
        write_nifti(str(tmp_path / f"{name}.nii.gz"), ct, np.eye(4))
    out_dir = str(tmp_path / "preds")
    classes = ["pancreas", "pancreatic_lesion"]

    def apply_fn(params, x):
        # input-driven prediction: spatially consistent across windows
        organ = jnp.where(x[..., 0] > 0.1, 10.0, -10.0)
        lesion = jnp.where(x[..., 0] > 1.2, 10.0, -10.0)
        return jnp.stack([organ, lesion], axis=-1)

    done = predict_folder([apply_fn], [None], str(tmp_path), out_dir, classes,
                          window=(16, 16, 16), batch=2, save_probabilities=True)
    assert sorted(done) == ["BDMAP_P1", "BDMAP_P2"]
    lesion = read_nifti(os.path.join(out_dir, "BDMAP_P1", "pancreatic_lesion.nii.gz"))
    assert lesion.data.shape == (20, 20, 20)
    assert lesion.data[7, 7, 7] == 1 and lesion.data[15, 15, 15] == 0
    assert os.path.exists(os.path.join(out_dir, "BDMAP_P1",
                                       "pancreatic_lesion_prob.nii.gz"))
    # resume skips everything the second time
    done2 = predict_folder([apply_fn], [None], str(tmp_path), out_dir, classes,
                           window=(16, 16, 16), batch=2)
    assert sorted(done2) == ["BDMAP_P1", "BDMAP_P2"]
