"""Host-side (CPU-worker) augmentation — the reference-parity pipeline mode.

The default pipeline augments ON DEVICE (`pipeline.device_augment`), which is
simplest operationally but serialises with the train step on the same chip —
the driver measured the augment pass at 134.5 ms/step at 96³, more than the
step itself (docs/perf.md, round-3 regressions). The reference instead
augments in DataLoader workers that overlap with GPU compute for free
(``rsuper_train/train_ddp.py:114`` num_workers + ``AugmentEternal.py``).
This module is that mode for the TPU loop: the same geometric + intensity
stack computed in numpy/scipy inside `PrefetchLoader` workers, so a
many-core TPU-VM host hides the whole augmentation cost behind the step.

Semantics mirror `pipeline._augment_items` (same theta composition, same
crop-window sampling formula, same intensity ops); randomness comes from the
worker's numpy Generator instead of the device PRNG, which is immaterial for
augmentation. The affine is theta-for-theta identical to the device path
(tested against `augment.affine_sample_window` in tests/test_data.py).

TPU notes carried over: all 3·C binary mask channels are packed into ONE
float64 word per voxel (48 channels < 53 mantissa bits, exact) so the
nearest-neighbour resample is a single `map_coordinates` call instead of 48.
Output arrays are emitted in ``out_dtype`` (bf16 via ml_dtypes) to halve the
host→device transfer, as the device path does.
"""

from __future__ import annotations

from typing import Dict

import numpy as np



def _theta_np(rng: np.random.Generator, scale, rotate_deg, translate,
              shear=(0.0, 0.0, 0.0)) -> np.ndarray:
    """Numpy mirror of `augment._affine_theta` (same composition
    rx·ry·rz·A, same parameter distributions)."""
    scale = np.asarray(scale, np.float32)
    sc = rng.uniform(1.0 - scale, 1.0 / np.maximum(1.0 - scale, 1e-3))
    sh2 = np.repeat(np.asarray(shear, np.float32), 2)
    sh = rng.uniform(-sh2, sh2 + 1e-12)
    tr3 = np.asarray(translate, np.float32)
    tr = rng.uniform(-tr3, tr3 + 1e-8)
    rot = np.asarray(rotate_deg, np.float32)
    ang = rng.uniform(-rot, np.maximum(rot, 1.0)) * (np.pi / 180.0)

    A = np.array([
        [sc[0], sh[0], sh[1], tr[0]],
        [sh[2], sc[1], sh[3], tr[1]],
        [sh[4], sh[5], sc[2], tr[2]],
        [0.0, 0.0, 0.0, 1.0],
    ], np.float32)

    def rx(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0],
                         [0, 0, 0, 1]], np.float32)

    def ry(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, -s, 0], [0, 1, 0, 0], [s, 0, c, 0],
                         [0, 0, 0, 1]], np.float32)

    def rz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0, 0], [s, c, 0, 0], [0, 0, 1, 0],
                         [0, 0, 0, 1]], np.float32)

    theta = rx(ang[0]) @ ry(ang[1]) @ rz(ang[2]) @ A
    return theta[:3, :]


def _window_coords(full_shape, theta, out_size, start):
    """Voxel-space source coordinates for the `out_size` window of the
    affine output grid — the exact formula of `augment._sample_window`
    (align-corners normalized coords)."""
    axes = [
        np.linspace(-1.0, 1.0, n, dtype=np.float32)[s: s + o]
        for n, o, s in zip(full_shape, out_size, start)
    ]
    zz, yy, xx = np.meshgrid(*axes, indexing="ij")
    coords = np.stack([zz, yy, xx, np.ones_like(zz)], 0).reshape(4, -1)
    src = theta.astype(np.float32) @ coords
    shp = np.asarray(full_shape, np.float32)
    return (src + 1.0) * 0.5 * (shp[:, None] - 1.0)


def affine_window_np(vol: np.ndarray, theta: np.ndarray, out_size, start,
                     order: int) -> np.ndarray:
    """scipy counterpart of `augment.affine_sample_window` on a (D, H, W)
    volume (same trilinear/nearest semantics, zero-padded)."""
    from scipy import ndimage

    vox = _window_coords(vol.shape, theta, out_size, start)
    out = ndimage.map_coordinates(vol, vox, order=order, mode="constant",
                                  cval=0.0)
    return out.reshape(out_size)


def _pack_f64(masks: np.ndarray) -> np.ndarray:
    """(..., C≤52) binary → one float64 word per voxel (exact)."""
    C = masks.shape[-1]
    pows = 2.0 ** np.arange(C, dtype=np.float64)
    return masks.astype(np.float64) @ pows


def _unpack_f64(words: np.ndarray, C: int) -> np.ndarray:
    out = np.empty(words.shape + (C,), np.float32)
    w = words.copy()
    for b in range(C):
        out[..., b] = np.mod(np.floor(w), 2.0)
        w *= 0.5
    return out


def _center_crop(a: np.ndarray, size) -> np.ndarray:
    starts = [(s - c) // 2 for s, c in zip(a.shape[:3], size)]
    sl = tuple(slice(st, st + c) for st, c in zip(starts, size))
    return a[sl]


def intensity_augment_np(img: np.ndarray, rng: np.random.Generator,
                         p: float = 0.3, noise_std_max: float = 0.2):
    """Numpy mirror of `augment.intensity_augment` (reference
    dataset_abdomenatlas_UFO.py:493-507: six ops, each with prob p)."""
    from scipy import ndimage

    img = img.astype(np.float32)
    if rng.uniform() < p:  # brightness multiplicative
        img = img * rng.uniform(0.7, 1.3)
    if rng.uniform() < p:  # brightness additive
        img = img + rng.normal(0.0, 0.1)
    if rng.uniform() < p:  # gamma, retain stats
        mean, std = img.mean(), img.std() + 1e-7
        mn = img.min()
        rngv = img.max() - mn + 1e-7
        g = rng.uniform(0.7, 1.5)
        img = ((img - mn) / rngv) ** g * rngv + mn
        img = (img - img.mean()) / (img.std() + 1e-7) * std + mean
    if rng.uniform() < p:  # contrast, preserve range
        mean, mn, mx = img.mean(), img.min(), img.max()
        img = np.clip((img - mean) * rng.uniform(0.7, 1.3) + mean, mn, mx)
    if rng.uniform() < p:  # gaussian blur
        sigma = rng.uniform(0.5, 1.5)
        # device path uses a static radius ceil(2.5*max_sigma)=4 and
        # zero-pads borders (lax conv); match both
        img = ndimage.gaussian_filter(img, sigma, truncate=4.0 / sigma,
                                      mode="constant", cval=0.0)
    if rng.uniform() < p:  # gaussian noise
        img = img + rng.normal(0.0, rng.uniform(0.0, noise_std_max),
                               img.shape).astype(np.float32)
    return img.astype(np.float32)


def make_host_augment(crop_size, affine_prob: float = 0.4,
                      scale=(0.0, 0.0, 0.0), rotate=(30.0, 30.0, 30.0),
                      translate=(0.0, 0.0, 0.0), intensity_prob: float = 0.3,
                      out_dtype=np.float32):
    """`transform(rec, rng) -> rec` for `PrefetchLoader(transform=...)`:
    random affine (gated by the record's ``apply_affine``) + centre crop +
    intensity stack, computed in the loader worker. Records leave at
    `crop_size` with ``apply_affine`` consumed, so the train loop runs NO
    device augmentation pass in this mode."""
    crop_size = tuple(crop_size)

    def transform(rec: Dict[str, np.ndarray], rng: np.random.Generator):
        img = np.asarray(rec["image"], np.float32)[..., 0]
        masks = np.concatenate(
            [np.asarray(rec[k], np.float32)
             for k in ("label", "unk", "segment_mask")], axis=-1)
        C3 = masks.shape[-1]
        C = rec["label"].shape[-1]
        do_aff = (float(rec.get("apply_affine", 1.0)) > 0
                  and rng.uniform() < affine_prob)
        if do_aff:
            theta = _theta_np(rng, scale, rotate, translate)
            starts = tuple(
                (s - c) // 2 for s, c in zip(img.shape, crop_size))
            img = affine_window_np(img, theta, crop_size, starts, order=1)
            packed = affine_window_np(_pack_f64(masks), theta, crop_size,
                                      starts, order=0)
            masks = _unpack_f64(packed, C3)
        else:
            img = _center_crop(img, crop_size)
            masks = _center_crop(masks, crop_size)
        img = intensity_augment_np(img, rng, p=intensity_prob)
        out = dict(rec)
        out.pop("apply_affine", None)
        out.update(
            image=img.astype(out_dtype)[..., None],
            label=masks[..., :C].astype(out_dtype),
            unk=masks[..., C: 2 * C].astype(out_dtype),
            segment_mask=masks[..., 2 * C:].astype(out_dtype),
        )
        return out

    return transform
