"""Data-layer tests: NIfTI IO, preprocessing, report parsing, crops, the joint
dataset, and the on-device augmentation pipeline — all on synthetic data."""

import os

import numpy as np
import pandas as pd
import pytest

from rsuper_tpu.data.nifti import NiftiImage, as_canonical, read_nifti, write_nifti
from rsuper_tpu.data.preprocess import (
    clip_and_normalize,
    load_case,
    preprocess_case,
    resample_to_spacing,
)
from rsuper_tpu.data import reports as rep
from rsuper_tpu.data import crops
from rsuper_tpu.data.dataset import (
    Case,
    RSuperDataConfig,
    RSuperDataset,
    build_case_list,
    to_channels_last,
)
from rsuper_tpu.data.pipeline import PrefetchLoader, device_augment

# ------------------------------------------------------------------- NIfTI IO
def test_nifti_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(12, 10, 8)).astype(np.float32)
    aff = np.diag([1.5, 1.5, 2.0, 1.0])
    aff[:3, 3] = [5, -3, 10]
    p = str(tmp_path / "x.nii.gz")
    write_nifti(p, vol, aff)
    img = read_nifti(p)
    np.testing.assert_allclose(img.data, vol, rtol=1e-6)
    np.testing.assert_allclose(img.affine, aff, rtol=1e-6)
    np.testing.assert_allclose(img.spacing, [1.5, 1.5, 2.0])


def test_nifti_uncompressed_and_int(tmp_path):
    vol = (np.arange(60).reshape(5, 4, 3) % 7).astype(np.int16)
    p = str(tmp_path / "y.nii")
    write_nifti(p, vol)
    img = read_nifti(p)
    np.testing.assert_array_equal(img.data, vol)


def test_as_canonical_flips():
    vol = np.arange(24, dtype=np.float32).reshape(4, 3, 2)
    aff = np.diag([-1.0, 1.0, 1.0, 1.0])  # L-flip
    img = as_canonical(NiftiImage(vol, aff))
    assert img.orientation() == ("R", "A", "S")
    np.testing.assert_array_equal(img.data, vol[::-1])
    # world coordinate of voxel (0,0,0) in output == voxel (3,0,0) in input
    assert img.affine[0, 3] == pytest.approx(-3.0)


def test_as_canonical_permutation():
    vol = np.random.default_rng(1).normal(size=(4, 5, 6)).astype(np.float32)
    # voxel axes: (y, z, x) ordering
    aff = np.zeros((4, 4))
    aff[1, 0] = 1.0  # axis0 -> A
    aff[2, 1] = 1.0  # axis1 -> S
    aff[0, 2] = 1.0  # axis2 -> R
    aff[3, 3] = 1.0
    img = as_canonical(NiftiImage(vol, aff))
    assert img.orientation() == ("R", "A", "S")
    assert img.data.shape == (6, 4, 5)


# --------------------------------------------------------------- preprocessing
def test_clip_and_normalize():
    img = np.array([[-2000.0, 0.0], [250.0, 1000.0]])
    out = clip_and_normalize(img)
    assert out.mean() == pytest.approx(0.0, abs=1e-5)
    assert out.std() == pytest.approx(1.0, abs=1e-4)


def test_resample_to_spacing():
    vol = np.zeros((10, 10, 10), np.float32)
    vol[4:6] = 1.0
    out = resample_to_spacing(vol, (2.0, 1.0, 1.0))
    assert out.shape == (20, 10, 10)


def test_preprocess_case_end_to_end(tmp_path):
    rng = np.random.default_rng(2)
    ct = (rng.normal(size=(20, 20, 20)) * 100).astype(np.float32)
    write_nifti(str(tmp_path / "ct.nii.gz"), ct, np.diag([2.0, 2.0, 2.0, 1.0]))
    organ = np.zeros((20, 20, 20), np.uint8)
    organ[5:15, 5:15, 5:15] = 1
    write_nifti(str(tmp_path / "organ.nii.gz"), organ, np.diag([2.0, 2.0, 2.0, 1.0]))
    out = str(tmp_path / "case.npz")
    meta = preprocess_case(
        str(tmp_path / "ct.nii.gz"),
        {"pancreas": str(tmp_path / "organ.nii.gz"), "liver": None},
        out,
        classes=["liver", "pancreas"],
        min_size=(48, 48, 48),
    )
    image, labels = load_case(out)
    assert image.shape == (48, 48, 48)  # 20 vox @2mm -> 40 @1mm -> padded 48
    assert labels.shape == (2, 48, 48, 48)
    assert labels[0].sum() == 0  # missing organ -> zero channel
    assert labels[1].sum() > 0
    assert meta["classes"] == ["liver", "pancreas"]


# -------------------------------------------------------------------- reports
def _reports_df():
    rows = [
        # usable pancreas case: one head tumor, known size
        dict(BDMAP_ID="C1", **{"Standardized Organ": "pancreas",
             "Standardized Location": "head", "Tumor Size (mm)": "20.0",
             "Unknow Tumor Size": "no", "no lesion": 0}),
        # kidney without laterality -> dropped
        dict(BDMAP_ID="C2", **{"Standardized Organ": "kidney",
             "Standardized Location": "u", "Tumor Size (mm)": "15.0",
             "Unknow Tumor Size": "no", "no lesion": 0}),
        # hallucination
        dict(BDMAP_ID="C3", **{"Standardized Organ": "pancreas",
             "Standardized Location": "tail", "Tumor Size (mm)": "0.0 x 0.0",
             "Unknow Tumor Size": "no", "no lesion": 0}),
        # healthy
        dict(BDMAP_ID="C4", **{"Standardized Organ": np.nan,
             "Standardized Location": np.nan, "Tumor Size (mm)": np.nan,
             "Unknow Tumor Size": np.nan, "no lesion": 1}),
        # multi-segment tumor, known size
        dict(BDMAP_ID="C5", **{"Standardized Organ": "pancreas",
             "Standardized Location": "head / body",
             "Tumor Size (mm)": "30 x 20 x 10",
             "Unknow Tumor Size": "no", "no lesion": 0}),
    ]
    return pd.DataFrame(rows)


def test_clean_reports():
    df, ids, per_organ = rep.clean_reports(_reports_df(), ["pancreas", "kidney"])
    assert "C1" in ids and "C5" in ids and "C4" in ids
    assert "C2" not in ids and "C3" not in ids
    assert "C1" in per_organ["pancreas"]
    assert per_organ["healthy"] == ["C4"]


def test_case_supervision_and_volumes():
    df = _reports_df()
    sup = rep.case_supervision(df[df.BDMAP_ID == "C5"])
    assert sup["has_tumor"]
    assert sup["segment_groups"] == [["body", "head"]]
    vols, dias = rep.estimate_tumor_volumes(df[df.BDMAP_ID == "C5"], ["body", "head"])
    want = (4 / 3) * np.pi * 15 * 10 * 5
    assert vols[0] == pytest.approx(want, rel=1e-5)
    np.testing.assert_allclose(dias[0], [30, 20, 10])
    assert vols[1:].sum() == 0
    # crop elsewhere -> no volumes
    vols2, _ = rep.estimate_tumor_volumes(df[df.BDMAP_ID == "C5"], ["tail"])
    assert vols2.sum() == 0


def test_case_supervision_healthy():
    df = _reports_df()
    sup = rep.case_supervision(df[df.BDMAP_ID == "C4"])
    assert not sup["has_tumor"] and sup["segment_groups"] == []


def test_parse_size_sphere_and_two_axis():
    v, d = rep.parse_size_mm("10")
    assert v == pytest.approx((4 / 3) * np.pi * 125)
    v2, d2 = rep.parse_size_mm("10 x 20")
    assert d2 == [10, 20, 15]


def test_segment_to_label():
    assert rep.segment_to_label("segment 3") == "liver_segment_3"
    assert rep.segment_to_label("head") == "pancreas_head"
    assert rep.segment_to_label("left") == "kidney_left"


# ---------------------------------------------------------------------- crops
def test_crop_foreground_contains_mask():
    rng = np.random.default_rng(3)
    img = rng.normal(size=(60, 60, 60)).astype(np.float32)
    lab = np.zeros((2, 60, 60, 60), np.uint8)
    fg = np.zeros((60, 60, 60), np.uint8)
    fg[20:30, 25:35, 40:50] = 1
    lab[1] = fg
    out = crops.crop_foreground(img, lab, fg, (32, 32, 32), rng=rng)
    assert isinstance(out, tuple)
    ci, cl, cf = out
    assert ci.shape == (32, 32, 32)
    assert cf.sum() == fg.sum()  # fully contained


def test_crop_foreground_too_big():
    img = np.zeros((40, 40, 40), np.float32)
    fg = np.ones((40, 40, 40), np.uint8)
    out = crops.crop_foreground(img, None, fg, (16, 16, 16))
    assert out == "mask does not fit crop size"
    assert crops.crop_foreground(img, None, np.zeros_like(fg), (16, 16, 16)) == "zero mask"


def test_random_crop_on_tumor_prefers_tumor():
    rng = np.random.default_rng(4)
    img = np.zeros((50, 50, 50), np.float32)
    lab = np.zeros((3, 50, 50, 50), np.uint8)
    lab[2, 30:34, 30:34, 30:34] = 1  # lesion
    hits = 0
    for _ in range(20):
        _, cl = crops.random_crop_on_tumor(img, lab, [2], (16, 16, 16), True, rng=rng)
        hits += int(cl[2].any())
    assert hits >= 16  # ~90% tumor crops


# ------------------------------------------------------------------- dataset
CLASSES = ["background", "kidney_left", "kidney_right", "liver", "pancreas",
           "pancreas_body", "pancreas_head", "pancreas_tail", "pancreatic_lesion"]
REPORT_CLASSES = ["background", "kidney_left", "kidney_right", "liver",
                  "pancreas_body", "pancreas_head", "pancreas_tail"]


def _make_mask_case(tmp_path, name="BDMAP_A"):
    rng = np.random.default_rng(5)
    img = rng.normal(size=(64, 64, 64)).astype(np.float32)
    labels = np.zeros((len(CLASSES), 64, 64, 64), bool)
    labels[CLASSES.index("pancreas"), 20:40, 20:40, 20:40] = True
    labels[CLASSES.index("pancreatic_lesion"), 28:34, 28:34, 28:34] = True
    path = str(tmp_path / f"{name}.npz")
    np.savez_compressed(path, image=img, labels=np.packbits(labels, axis=0),
                        num_classes=len(CLASSES))
    return name, path


def _make_report_case(tmp_path, name="BDMAP_R"):
    rng = np.random.default_rng(6)
    img = rng.normal(size=(64, 64, 64)).astype(np.float32)
    labels = np.zeros((len(REPORT_CLASSES), 64, 64, 64), bool)
    labels[REPORT_CLASSES.index("pancreas_head"), 16:32, 16:32, 16:32] = True
    labels[REPORT_CLASSES.index("pancreas_body"), 32:44, 16:32, 16:32] = True
    labels[REPORT_CLASSES.index("liver"), 40:60, 40:60, 40:60] = True
    path = str(tmp_path / f"{name}.npz")
    np.savez_compressed(path, image=img, labels=np.packbits(labels, axis=0),
                        num_classes=len(REPORT_CLASSES))
    return name, path


def _report_rows():
    return pd.DataFrame([
        dict(BDMAP_ID="BDMAP_R", **{"Standardized Organ": "pancreas",
             "Standardized Location": "head", "Tumor Size (mm)": "12.0",
             "Unknow Tumor Size": "no", "no lesion": 0}),
    ])


def _cfg(augment=True):
    return RSuperDataConfig(
        classes=tuple(CLASSES), report_classes=tuple(REPORT_CLASSES),
        crop_size=(32, 32, 32), tumor_classes=("pancreas",),
        augment_margin=augment,
    )


def test_dataset_mask_case(tmp_path):
    cases = [Case(*_make_mask_case(tmp_path), False)]
    ds = RSuperDataset(cases, _cfg())
    rec = ds.sample(0, np.random.default_rng(0))
    assert rec["image"].shape == (52, 72, 72)
    assert rec["label"].shape == (len(CLASSES), 52, 72, 72)
    assert rec["unk"].sum() == 0 and rec["segment_mask"].sum() == 0
    assert rec["volumes"].sum() == 0


def test_dataset_report_case(tmp_path):
    cases = [Case(*_make_report_case(tmp_path), True)]
    ds = RSuperDataset(cases, _cfg(), report_rows=_report_rows())
    got_segment = 0
    for s in range(10):
        rec = ds.sample(0, np.random.default_rng(s))
        ci = CLASSES.index("pancreatic_lesion")
        if rec["segment_mask"].any():
            got_segment += 1
            assert rec["segment_mask"][ci].any()
            assert rec["segment_mask"][[i for i in range(len(CLASSES)) if i != ci]].sum() == 0
            assert rec["volumes"][0] == pytest.approx((4 / 3) * np.pi * 6**3, rel=1e-4)
            # unk covers the tumor-bearing segment
            assert rec["unk"][ci].any()
            assert rec["apply_affine"] == 0.0
        # pancreas organ channel reconstructed from subsegments
        assert rec["label"][CLASSES.index("pancreas")].sum() >= 0
    assert got_segment >= 7  # ~90% segment-targeted


def test_dataset_report_rejects_lesion_classes():
    with pytest.raises(ValueError):
        RSuperDataConfig(
            classes=tuple(CLASSES),
            report_classes=tuple(REPORT_CLASSES) + ("pancreatic_lesion",),
        )


def test_build_case_list_balances():
    mask = [("a%d" % i, "p") for i in range(5)]
    report = [("b", "q")]
    cases = build_case_list(mask, report, balance=True, seed=0)
    n_rep = sum(c.is_report for c in cases)
    assert n_rep == 5 and len(cases) == 10


# ------------------------------------------------------- device augmentation
def test_device_augment_shapes_and_flags(tmp_path):
    import jax

    B, C = 2, len(CLASSES)
    load = (52, 72, 72)
    batch = {
        "image": np.random.default_rng(7).normal(size=(B, *load, 1)).astype(np.float32),
        "label": np.zeros((B, *load, C), np.uint8),
        "unk": np.zeros((B, *load, C), np.uint8),
        "segment_mask": np.zeros((B, *load, C), np.uint8),
        "volumes": np.zeros((B, 10), np.float32),
        "diameters": np.zeros((B, 10, 3), np.float32),
        "apply_affine": np.ones((B,), np.float32),
    }
    batch["label"][:, 20:30, 30:40, 30:40, 4] = 1
    out = device_augment(
        {k: jax.numpy.asarray(v) for k, v in batch.items()},
        jax.random.PRNGKey(0),
        crop_size=(32, 32, 32),
    )
    assert out["image"].shape == (B, 32, 32, 32, 1)
    assert out["label"].shape == (B, 32, 32, 32, C)
    assert "apply_affine" not in out
    lab = np.asarray(out["label"])
    assert set(np.unique(lab)) <= {0.0, 1.0}  # nearest-neighbour labels stay binary


def test_device_augment_packed_matches_unpacked():
    """The host-packed transfer path (pack_record_masks → masks_packed bytes
    → _bytes_to_words on device) must produce bit-identical augmented masks
    and images vs the one-hot path under the same PRNG key."""
    import jax

    from rsuper_tpu.data.pipeline import pack_record_masks

    B, C = 2, len(CLASSES)
    load = (52, 72, 72)
    rng = np.random.default_rng(11)
    recs = []
    for _ in range(B):
        recs.append({
            "image": rng.normal(size=(*load, 1)).astype(np.float32),
            "label": (rng.random((*load, C)) > 0.8).astype(np.uint8),
            "unk": (rng.random((*load, C)) > 0.9).astype(np.uint8),
            "segment_mask": (rng.random((*load, C)) > 0.95).astype(np.uint8),
            "volumes": np.zeros((10,), np.float32),
            "diameters": np.zeros((10, 3), np.float32),
            "apply_affine": np.ones((), np.float32),
        })
    stack = lambda rs: {k: np.stack([r[k] for r in rs]) for k in rs[0]}
    batch = stack(recs)
    # image_dtype=None isolates the mask packing (f16 image narrowing is a
    # separate, deliberate precision choice)
    packed = stack([pack_record_masks(r, image_dtype=None) for r in recs])
    assert packed["masks_packed"].shape == (*((B,) + load), (3 * C + 7) // 8)

    key = jax.random.PRNGKey(3)
    out_a = device_augment(
        {k: jax.numpy.asarray(v) for k, v in batch.items()}, key,
        crop_size=(32, 32, 32))
    out_b = device_augment(
        {k: jax.numpy.asarray(v) for k, v in packed.items()}, key,
        crop_size=(32, 32, 32), num_classes=C)
    for k in ("image", "label", "unk", "segment_mask"):
        np.testing.assert_array_equal(np.asarray(out_a[k]),
                                      np.asarray(out_b[k]), err_msg=k)
    assert "masks_packed" not in out_b


def test_affine_sample_window_matches_full_warp_then_crop():
    """The pipeline's fused window sampler must be bitwise-equal to the naive
    warp-full-volume-then-center_crop composition it replaced (it samples the
    same output-grid coordinates, just only inside the crop window)."""
    import jax
    import jax.numpy as jnp

    from rsuper_tpu.data.augment import (
        _affine_theta,
        affine_sample,
        affine_sample_window,
        center_crop,
    )

    rng = np.random.default_rng(3)
    vol = jnp.asarray(rng.normal(size=(20, 28, 28)).astype(np.float32))
    lab = jnp.asarray(
        (rng.random((20, 28, 28, 3)) > 0.7).astype(np.float32)
    )
    theta = _affine_theta(jax.random.PRNGKey(5), (0.2, 0.2, 0.2),
                          (30.0, 30.0, 30.0), (0.1, 0.1, 0.1),
                          (0.0, 0.0, 0.0))
    crop = (12, 16, 16)
    starts = tuple((s - c) // 2 for s, c in zip(vol.shape, crop))
    ref = center_crop(affine_sample(vol, theta, order=1), crop)
    got = affine_sample_window(vol, theta, crop, starts, order=1)
    # same coordinates mathematically; XLA fuses the (4,N) matmul differently
    # for the two grid sizes, so allow f32 rounding noise
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    ref0 = center_crop(affine_sample(lab, theta, order=0), crop)
    got0 = affine_sample_window(lab, theta, crop, starts, order=0)
    # nearest-neighbour: rounding noise can flip voxels whose source lands
    # exactly on a .5 corner boundary — allow a <1% flip budget
    flips = float(np.mean(np.asarray(got0) != np.asarray(ref0)))
    assert flips < 0.01, flips


def test_prefetch_loader(tmp_path):
    cases = [
        Case(*_make_mask_case(tmp_path, "BDMAP_A"), False),
        Case(*_make_report_case(tmp_path, "BDMAP_R"), True),
    ]
    ds = RSuperDataset(cases, _cfg(), report_rows=_report_rows())
    loader = PrefetchLoader(ds, batch_size=2, indices=[0, 1, 0, 1], num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    for b in batches:
        assert b["image"].shape == (2, 52, 72, 72, 1)
        assert b["label"].shape[-1] == len(CLASSES)


def test_pack_record_cf_matches_packed_path(tmp_path):
    """The channel-first fast pack path (pipeline.pack_record_cf, native
    rsuper_pack_masks_cl when built, numpy fallback otherwise) must produce
    byte-identical transfer records to to_channels_last + pack_record_masks
    for both mask cases (zero unk/seg) and report cases (real unk/seg)."""
    from rsuper_tpu.data.pipeline import pack_record_cf, pack_record_masks

    cases = [
        Case(*_make_mask_case(tmp_path, "BDMAP_A"), False),
        Case(*_make_report_case(tmp_path, "BDMAP_R"), True),
    ]
    ds = RSuperDataset(cases, _cfg(), report_rows=_report_rows())
    for i in range(2):
        rec = ds.sample(i, np.random.default_rng(7))
        ref = pack_record_masks(to_channels_last(dict(rec)), np.float16)
        got = pack_record_cf(dict(rec), np.float16)
        assert set(ref) == set(got)
        np.testing.assert_array_equal(ref["masks_packed"],
                                      got["masks_packed"])
        np.testing.assert_array_equal(ref["image"], got["image"])


def test_pack_masks_cl_native_matches_numpy():
    """Native bit layout == np.packbits(..., bitorder='little'), including
    non-multiple-of-8 channel counts and nullptr (all-zero) unk/seg."""
    from rsuper_tpu.data import native_io

    if not native_io.available():
        pytest.skip("native library not built (make -C native)")
    rng = np.random.default_rng(3)
    for C in (16, 13, 5, 1):
        sh = (6, 7, 8)
        label = (rng.random((C,) + sh) < 0.4).astype(np.uint8)
        unk = (rng.random((C,) + sh) < 0.2).astype(np.uint8)
        seg = (rng.random((C,) + sh) < 0.1).astype(np.uint8)
        m = np.moveaxis(np.concatenate([label, unk, seg], axis=0), 0, -1)
        ref = np.packbits(m, axis=-1, bitorder="little")
        np.testing.assert_array_equal(
            native_io.pack_masks_cl(label, unk, seg), ref)
        m0 = np.moveaxis(
            np.concatenate([label, 0 * unk, 0 * seg], axis=0), 0, -1)
        np.testing.assert_array_equal(
            native_io.pack_masks_cl(label, None, None),
            np.packbits(m0, axis=-1, bitorder="little"))


def test_device_prefetcher_matches_inline(tmp_path):
    """DevicePrefetcher (transfer thread + augment dispatch) must yield the
    exact batches of the inline path given the same loader contents and PRNG
    key, and surface loader errors in the consumer."""
    import jax
    from jax.sharding import Mesh
    from rsuper_tpu.data.pipeline import DevicePrefetcher, build_augment_step
    from rsuper_tpu.parallel.multihost import (global_key_slices,
                                               local_batch_to_global)

    cases = [Case(*_make_mask_case(tmp_path, "BDMAP_A"), False)]
    ds = RSuperDataset(cases, _cfg(), report_rows=None)
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2), ("data",))
    crop = (32, 48, 48)
    augment_fn = build_augment_step(
        mesh, crop_size=crop, scale=(0.1, 0.1, 0.1),
        num_classes=len(CLASSES))
    key = jax.random.PRNGKey(5)

    def batches(i):  # deterministic: one worker, fixed seed
        return PrefetchLoader(ds, batch_size=2, indices=[0, 0, 0, 0],
                              num_workers=1, seed=9, pack_masks=True)

    got = list(DevicePrefetcher(batches(0), mesh, augment_fn=augment_fn,
                                key=key, global_batch=2))
    k = key
    want = []
    for batch in batches(1):
        k, kk = jax.random.split(k)
        keys = global_key_slices(jax.random.split(kk, 2), mesh)
        want.append(augment_fn(local_batch_to_global(batch, mesh), keys))
    assert len(got) == len(want) == 2
    for g, w in zip(got, want):
        assert set(g) == set(w)
        for name in g:
            np.testing.assert_array_equal(np.asarray(g[name]),
                                          np.asarray(w[name]))

    class Boom:
        def __iter__(self):
            raise RuntimeError("loader died")

    with pytest.raises(RuntimeError, match="loader died"):
        list(DevicePrefetcher(Boom(), mesh, key=key))


def test_native_io_if_built():
    """Native kernels (if built) must agree with the scipy paths."""
    from rsuper_tpu.data import native_io

    if not native_io.available():
        pytest.skip("native library not built (make -C native)")
    import scipy.ndimage as ndi

    rng = np.random.default_rng(0)
    src = rng.random((20, 24, 28)).astype(np.float32)
    out = native_io.resample(src, (40, 48, 56), order=1)
    ref = ndi.zoom(src, 2.0, order=1, mode="nearest", grid_mode=False)
    np.testing.assert_allclose(out, ref, atol=1e-6)
    lab = (rng.random((10, 10, 10)) * 4).astype(np.uint8)
    outl = native_io.resample(lab, (20, 20, 20), order=0)
    refl = ndi.zoom(lab, 2.0, order=0, mode="nearest", grid_mode=False)
    np.testing.assert_array_equal(outl, refl)
    z = native_io.clip_zscore(src * 1000 - 400, -991.0, 500.0)
    assert abs(z.mean()) < 1e-4 and abs(z.std() - 1.0) < 1e-4


def test_class_weights():
    from rsuper_tpu.data.class_weights import class_proportions, sample_class_weights

    per_ct = pd.DataFrame({
        "BDMAP_ID": ["a", "b", "c", "d"],
        "number of pancreatic lesion instances": [1, 0, 0, 0],
        "number of kidney lesion instances": [0, 0, 0, 0],
    })
    props = class_proportions(per_ct, ["a", "b", "c", "d"],
                              ["pancreatic_lesion", "kidney_lesion"])
    assert props["pancreatic_lesion"] == 0.25
    assert props["healthy"] == 0.75

    labels = np.zeros((3, 4, 4, 4), np.uint8)
    labels[1, 0, 0, 0] = 1  # positive pancreatic lesion
    names = ["background", "pancreatic_lesion", "kidney_lesion"]
    w = sample_class_weights(labels, props, names)
    assert w.sum() == pytest.approx(3.0, rel=1e-5)
    # rare positive gets the largest weight
    assert w[1] == w.max()


def test_chunked_sampler():
    from rsuper_tpu.data.sampler import ChunkedSampler

    s = ChunkedSampler(num_items=10, samples_per_epoch=6, seed=0)
    e0 = s.epoch_indices(0)
    e1 = s.epoch_indices(1)
    assert len(e0) == len(e1) == 6
    # two epochs cover the first full permutation + wrap into a reshuffle
    assert set(e0.tolist() + e1.tolist()) >= set(range(10)) - set(range(0))
    # sharded: disjoint round-robin slices of the same chunk
    a = ChunkedSampler(10, 8, shard=0, num_shards=2, seed=1)
    b = ChunkedSampler(10, 8, shard=1, num_shards=2, seed=1)
    ia, ib = a.epoch_indices(0), b.epoch_indices(0)
    assert len(ia) == len(ib) == 4


def test_organ_batch_sampler():
    from rsuper_tpu.data.sampler import OrganBatchSampler

    s = OrganBatchSampler(["liver", "kidney", "liver", "kidney"], batch_size=3,
                          seed=0)
    batch = s.batch(0)
    organs = {"liver": {0, 2}, "kidney": {1, 3}}
    assert len(batch) == 3
    assert any(set(batch) <= v for v in organs.values())
    # deterministic per step
    np.testing.assert_array_equal(batch, s.batch(0))


def test_organ_batch_sampler_epochs_and_shards():
    from rsuper_tpu.data.sampler import OrganBatchSampler

    organs = ["liver", "kidney", "liver", "kidney", "pancreas", "pancreas"]
    pools = {
        "liver": {0, 2}, "kidney": {1, 3}, "pancreas": {4, 5},
    }
    a = OrganBatchSampler(organs, batch_size=4, seed=3, shard=0, num_shards=2)
    b = OrganBatchSampler(organs, batch_size=4, seed=3, shard=1, num_shards=2)
    ia, ib = a.epoch_indices(0, steps_per_epoch=5), b.epoch_indices(0, steps_per_epoch=5)
    assert len(ia) == len(ib) == 10  # 5 steps x local batch 2
    for s in range(5):
        # each global step's items (across both shards) share one organ
        step_items = set(ia[2 * s : 2 * s + 2]) | set(ib[2 * s : 2 * s + 2])
        assert any(step_items <= pool for pool in pools.values()), step_items
    # different epochs draw different organ sequences (deterministic per step)
    np.testing.assert_array_equal(ia, a.epoch_indices(0, steps_per_epoch=5))


def test_dataset_crop_organs(tmp_path):
    mask = Case(*_make_mask_case(tmp_path), False)
    report = Case(*_make_report_case(tmp_path), True)
    ds = RSuperDataset([mask, report], _cfg(), report_rows=_report_rows())
    assert ds.crop_organs() == ["mask", "pancreas"]
    # report case without rows -> healthy pool
    ds2 = RSuperDataset([report], _cfg(), report_rows=None)
    assert ds2.crop_organs() == ["healthy"]


def test_slice_dataset_2d(tmp_path):
    """2D pathway dataset: foreground-biased axial slices, fixed-shape
    records compatible with to_channels_last + PrefetchLoader."""
    from rsuper_tpu.data.dataset2d import SliceDataConfig, SliceDataset

    case = Case(*_make_mask_case(tmp_path), False)
    ds = SliceDataset([case], SliceDataConfig(
        classes=tuple(CLASSES), crop_size=(48, 48), fg_bias=1.0))
    rng = np.random.default_rng(0)
    rec = ds.sample(0, rng)
    assert rec["image"].shape == (48, 48)
    assert rec["label"].shape == (len(CLASSES), 48, 48)
    assert rec["volumes"].shape == (10,)
    # fg_bias=1: the sampled slice carries foreground (pancreas 20:40 in z)
    hits = sum(ds.sample(0, rng)["label"][1:].any() for _ in range(10))
    assert hits == 10
    out = to_channels_last(rec)
    assert out["image"].shape == (48, 48, 1)
    assert out["label"].shape == (48, 48, len(CLASSES))


def test_preprocess_background_synthesis(tmp_path):
    ct = np.zeros((16, 16, 16), np.float32)
    organ = np.zeros((16, 16, 16), np.uint8)
    organ[4:8, 4:8, 4:8] = 1
    write_nifti(str(tmp_path / "ct.nii.gz"), ct, np.eye(4))
    write_nifti(str(tmp_path / "organ.nii.gz"), organ, np.eye(4))
    out = str(tmp_path / "c.npz")
    preprocess_case(
        str(tmp_path / "ct.nii.gz"),
        {"background": None, "pancreas": str(tmp_path / "organ.nii.gz")},
        out, classes=["background", "pancreas"], min_size=(16, 16, 16),
    )
    _, labels = load_case(out)
    np.testing.assert_array_equal(labels[0], 1 - labels[1])


def test_kfold_split():
    from rsuper_tpu.data.dataset import kfold_split

    cases = [Case(f"c{i}", "p", False) for i in range(10)]
    seen_test = set()
    for f in range(5):
        tr, te = kfold_split(cases, 5, f, seed=3)
        assert len(te) == 2 and len(tr) == 8
        assert not {c.case_id for c in tr} & {c.case_id for c in te}
        seen_test |= {c.case_id for c in te}
    assert len(seen_test) == 10  # folds partition the data


def test_pack_unpack_bits():
    from rsuper_tpu.data.pipeline import _pack_bits, _unpack_bits
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    m = (rng.random((4, 4, 4, 50)) > 0.5).astype(np.float32)
    w = _pack_bits(jnp.asarray(m))
    assert w.shape == (4, 4, 4, 3)  # ceil(50/24)
    back = np.asarray(_unpack_bits(w, 50))
    np.testing.assert_array_equal(back, m)


def test_native_nifti_decode_matches_numpy(tmp_path):
    """Fused native NIfTI payload decode (scale+cast, one pass) must match
    the numpy frombuffer->scale->astype chain, and read_nifti(dtype=f32)
    must produce identical volumes either way."""
    from rsuper_tpu.data import native_io
    from rsuper_tpu.data.nifti import read_nifti, write_nifti

    if not native_io.available():
        pytest.skip("native library not built (make -C native)")

    rng = np.random.default_rng(0)
    for arr in (
        (rng.random((9, 7, 5)) * 200 - 100).astype(np.float32),
        (rng.integers(-1000, 2000, (8, 6, 4))).astype(np.int16),
        (rng.integers(0, 250, (5, 5, 5))).astype(np.uint8),
    ):
        p = tmp_path / f"v_{arr.dtype}.nii.gz"
        write_nifti(str(p), arr, np.eye(4))
        img = read_nifti(str(p), dtype=np.float32)
        np.testing.assert_allclose(img.data, arr.astype(np.float32),
                                   rtol=1e-6)

    # direct wrapper: slope/inter applied per element
    raw = np.arange(6, dtype=np.int16).tobytes()
    flat = native_io.nifti_scale_cast_f32(raw, 0, 4, 6, 2.0, -1.0)
    np.testing.assert_allclose(flat, np.arange(6) * 2.0 - 1.0)
    # unsupported dtype code -> None (caller falls back)
    assert native_io.nifti_scale_cast_f32(raw, 0, 999, 6, 1.0, 0.0) is None


def test_host_augment_matches_device_affine():
    """`data/host_augment.py` (the reference-parity CPU-worker augmentation
    mode) must sample the exact same affine: theta-for-theta, the scipy
    window resample equals `augment.affine_sample_window` (same align-
    corners coords, same trilinear/nearest), and the f64 mask packing is
    exact for 48 channels."""
    import jax.numpy as jnp

    from rsuper_tpu.data import host_augment as H
    from rsuper_tpu.data.augment import affine_sample_window

    rng = np.random.default_rng(3)
    vol = rng.normal(size=(40, 44, 44)).astype(np.float32)
    theta = H._theta_np(rng, (0.1, 0.1, 0.1), (30.0, 30.0, 30.0),
                        (0.05, 0.05, 0.05))
    out_size, start = (24, 24, 24), (8, 10, 10)
    got = H.affine_window_np(vol, theta, out_size, start, order=1)
    want = np.asarray(affine_sample_window(
        jnp.asarray(vol), jnp.asarray(theta), out_size, start, order=1))
    assert np.max(np.abs(got - want)) < 2e-4, np.max(np.abs(got - want))

    # f64 mask packing is exact for 48 channels (jax can't check this side —
    # x64 is disabled, so the device path packs 24-bit f32 words instead)
    masks = (rng.random(size=(40, 44, 44, 48)) > 0.8).astype(np.float32)
    packed = H._pack_f64(masks)
    assert np.array_equal(H._unpack_f64(packed, 48), masks)
    # nearest-neighbour index choice matches the device path (small-int
    # volume, exact in f32; only exact .5 coordinate boundaries may differ)
    ids = (np.arange(40 * 44 * 44, dtype=np.float32) % 997).reshape(40, 44, 44)
    got0 = H.affine_window_np(ids, theta, out_size, start, order=0)
    want0 = np.asarray(affine_sample_window(
        jnp.asarray(ids), jnp.asarray(theta), out_size, start, order=0))
    eq = got0 == want0
    assert eq.mean() > 0.999, eq.mean()


def test_host_augment_transform_end_to_end():
    from rsuper_tpu.data.host_augment import make_host_augment

    rng = np.random.default_rng(0)
    C = 5
    rec = {
        "image": rng.normal(size=(36, 40, 40, 1)).astype(np.float32),
        "label": (rng.random(size=(36, 40, 40, C)) > 0.9).astype(np.float32),
        "unk": np.zeros((36, 40, 40, C), np.float32),
        "segment_mask": np.zeros((36, 40, 40, C), np.float32),
        "volumes": np.zeros((10,), np.float32),
        "diameters": np.zeros((10, 3), np.float32),
        "apply_affine": np.ones((), np.float32),
    }
    t = make_host_augment((24, 24, 24), affine_prob=1.0, scale=(0.1,) * 3,
                          rotate=(30.0,) * 3)
    out = t(dict(rec), np.random.default_rng(1))
    assert out["image"].shape == (24, 24, 24, 1)
    assert out["label"].shape == (24, 24, 24, C)
    assert "apply_affine" not in out
    assert set(np.unique(out["label"])) <= {0.0, 1.0}
    # apply_affine=0 records are never warped: center crop equals the source
    rec0 = dict(rec)
    rec0["apply_affine"] = np.zeros((), np.float32)
    t0 = make_host_augment((24, 24, 24), affine_prob=1.0,
                           intensity_prob=0.0)
    out0 = t0(rec0, np.random.default_rng(2))
    assert np.array_equal(out0["label"],
                          rec["label"][6:30, 8:32, 8:32])


def test_nearest_window_multichannel_bitwise():
    """The shared-index multi-channel order-0 sampler must be BITWISE equal
    to per-channel map_coordinates (same round-half-even, same constant-0
    out-of-bounds) — it only de-duplicates the index arithmetic."""
    import jax
    import jax.numpy as jnp

    from rsuper_tpu.data.augment import (
        _affine_theta,
        _sample_window,
        affine_sample_window,
    )

    rng = np.random.default_rng(11)
    lab = jnp.asarray(rng.random((18, 26, 24, 5)).astype(np.float32))
    theta = _affine_theta(jax.random.PRNGKey(9), (0.2, 0.2, 0.2),
                          (30.0, 30.0, 30.0), (0.1, 0.1, 0.1),
                          (0.0, 0.0, 0.0))
    crop = (10, 14, 12)
    starts = tuple((s - c) // 2 for s, c in zip(lab.shape[:3], crop))
    got = affine_sample_window(lab, theta, crop, starts, order=0)
    ref = jax.vmap(
        lambda c: _sample_window(c, theta, crop, starts, 0),
        in_axes=-1, out_axes=-1,
    )(lab)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
