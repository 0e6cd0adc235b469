"""On-device 3D augmentations (JAX, static shapes, vmappable over the batch).

Functional equivalent of the reference's torch augmentation library
(``rsuper_train/training/augmentation.py``): gaussian noise (:17) / blur
(:48), additive & multiplicative brightness (:69/:86), gamma with retained
stats (:106), contrast with preserved range (:140), mirror (:171), and the
affine scale/rotate/shear/translate transform (:228) applied through a
sampling grid.

TPU-first redesign: the reference augments on CPU dataloader workers (config
``aug_device: 'cpu'``), which is the classic input-bound failure mode for 3D
training. Here every augmentation is a jittable function on device: intensity
ops fuse into a handful of VPU kernels, the affine transform is one fused
trilinear gather, and probabilistic application uses `jnp.where` on traced
uniforms so one compiled program covers all coin-flips.

Volumes are (D, H, W) single-channel unless noted; labels (D, H, W, C).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


# ------------------------------------------------------------- intensity ops
def gaussian_noise(img, key, std):
    return img + std * jax.random.normal(key, img.shape, img.dtype)


def _gauss_kernel1d(sigma, radius: int):
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-(x**2) / (2.0 * sigma**2))
    return k / jnp.sum(k)


def gaussian_blur(img, sigma, max_sigma: float = 1.5):
    """Separable 3D gaussian blur; `sigma` may be traced, the kernel radius is
    static from `max_sigma` (reference ``gaussian_blur`` :48 draws sigma in
    [0.5, 1.5])."""
    radius = int(math.ceil(2.5 * max_sigma))
    k = _gauss_kernel1d(sigma, radius)
    out = img.astype(jnp.float32)
    for axis in range(3):
        out = jnp.moveaxis(out, axis, -1)
        shape = out.shape
        flat = out.reshape(-1, 1, shape[-1])
        conv = jax.lax.conv_general_dilated(
            flat, k.reshape(1, 1, -1), (1,), [(radius, radius)],
            dimension_numbers=("NCH", "IOH", "NCH"),
        )
        out = jnp.moveaxis(conv.reshape(shape), -1, axis)
    return out.astype(img.dtype)


def brightness_additive(img, key, std: float = 0.1):
    return img + std * jax.random.normal(key, (), img.dtype)


def brightness_multiply(img, key, rng: Tuple[float, float] = (0.7, 1.3)):
    m = jax.random.uniform(key, (), minval=rng[0], maxval=rng[1])
    return img * m.astype(img.dtype)


def gamma(img, key, rng: Tuple[float, float] = (0.7, 1.5), retain_stats: bool = True):
    g = jax.random.uniform(key, (), minval=rng[0], maxval=rng[1])
    x = img.astype(jnp.float32)
    mn, mx = jnp.min(x), jnp.max(x)
    span = jnp.maximum(mx - mn, 1e-8)
    mean, std = jnp.mean(x), jnp.std(x)
    y = jnp.power((x - mn) / span, g) * span + mn
    if retain_stats:
        y = (y - jnp.mean(y)) / jnp.maximum(jnp.std(y), 1e-8) * std + mean
    return y.astype(img.dtype)


def contrast(img, key, rng: Tuple[float, float] = (0.7, 1.3), preserve_range: bool = True):
    f = jax.random.uniform(key, (), minval=rng[0], maxval=rng[1])
    x = img.astype(jnp.float32)
    mn, mx, mean = jnp.min(x), jnp.max(x), jnp.mean(x)
    y = (x - mean) * f + mean
    if preserve_range:
        y = jnp.clip(y, mn, mx)
    return y.astype(img.dtype)


def mirror(img, axis: int):
    return jnp.flip(img, axis=axis)


def intensity_augment(img, key, p: float = 0.3, noise_std_max: float = 0.2):
    """The reference's online intensity stack (``dataset_abdomenatlas_UFO.py:493-507``):
    each op fires independently with probability `p`. Branchless: both results
    are computed and selected, so one compiled program serves every draw."""
    keys = jax.random.split(key, 12)
    coins = jax.random.uniform(keys[0], (6,))

    img = jnp.where(coins[0] < p, brightness_multiply(img, keys[1]), img)
    img = jnp.where(coins[1] < p, brightness_additive(img, keys[2]), img)
    img = jnp.where(coins[2] < p, gamma(img, keys[3]), img)
    img = jnp.where(coins[3] < p, contrast(img, keys[4]), img)
    sigma = jax.random.uniform(keys[5], (), minval=0.5, maxval=1.5)
    img = jnp.where(coins[4] < p, gaussian_blur(img, sigma), img)
    std = jax.random.uniform(keys[6], (), minval=0.0, maxval=noise_std_max)
    img = jnp.where(coins[5] < p, gaussian_noise(img, keys[7], std), img)
    return img


# ---------------------------------------------------------- affine transform
def _affine_theta(key, scale, rotate_deg, translate, shear):
    """Random 3x4 affine in normalized [-1, 1] coordinates, composed like the
    reference (rotations X·Y·Z times scale/shear/translate, :228-310)."""
    ks = jax.random.split(key, 4)
    scale = jnp.asarray(scale, jnp.float32)
    sc = jax.random.uniform(ks[0], (3,), minval=1.0 - scale,
                            maxval=1.0 / jnp.maximum(1.0 - scale, 1e-3))
    sh = jax.random.uniform(ks[1], (6,), minval=-jnp.repeat(jnp.asarray(shear, jnp.float32), 2),
                            maxval=jnp.repeat(jnp.asarray(shear, jnp.float32), 2))
    tr = jax.random.uniform(ks[2], (3,), minval=-jnp.asarray(translate, jnp.float32),
                            maxval=jnp.asarray(translate, jnp.float32) + 1e-8)
    ang = jax.random.uniform(
        ks[3], (3,),
        minval=-jnp.asarray(rotate_deg, jnp.float32),
        maxval=jnp.maximum(jnp.asarray(rotate_deg, jnp.float32), 1.0),
    ) * (jnp.pi / 180.0)

    A = jnp.array(
        [
            [sc[0], sh[0], sh[1], tr[0]],
            [sh[2], sc[1], sh[3], tr[1]],
            [sh[4], sh[5], sc[2], tr[2]],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )

    def rx(a):
        c, s = jnp.cos(a), jnp.sin(a)
        return jnp.array([[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]],
                         jnp.float32)

    def ry(a):
        c, s = jnp.cos(a), jnp.sin(a)
        return jnp.array([[c, 0, -s, 0], [0, 1, 0, 0], [s, 0, c, 0], [0, 0, 0, 1]],
                         jnp.float32)

    def rz(a):
        c, s = jnp.cos(a), jnp.sin(a)
        return jnp.array([[c, -s, 0, 0], [s, c, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
                         jnp.float32)

    theta = rx(ang[0]) @ ry(ang[1]) @ rz(ang[2]) @ A
    return theta[:3, :]


def _sample_grid(vol, theta, out_shape, order: int):
    """Sample `vol` (D, H, W) at affine-transformed normalized coords
    (align-corners convention, matching torch affine_grid/grid_sample)."""
    D, H, W = out_shape
    zs = jnp.linspace(-1.0, 1.0, D)
    ys = jnp.linspace(-1.0, 1.0, H)
    xs = jnp.linspace(-1.0, 1.0, W)
    zz, yy, xx = jnp.meshgrid(zs, ys, xs, indexing="ij")
    coords = jnp.stack([zz, yy, xx, jnp.ones_like(zz)], axis=0).reshape(4, -1)
    src = theta @ coords  # (3, N) normalized source coords (z, y, x)
    shp = jnp.asarray(vol.shape, jnp.float32)
    vox = (src + 1.0) * 0.5 * (shp[:, None] - 1.0)
    out = jax.scipy.ndimage.map_coordinates(
        vol.astype(jnp.float32), list(vox), order=order, mode="constant", cval=0.0
    )
    return out.reshape(out_shape)


@partial(jax.jit, static_argnames=("order",))
def affine_sample(vol, theta, order: int = 1):
    """Apply a 3x4 normalized-coordinate affine to (D,H,W) or (D,H,W,C)."""
    if vol.ndim == 3:
        return _sample_grid(vol, theta, vol.shape, order).astype(vol.dtype)
    out = jax.vmap(lambda c: _sample_grid(c, theta, vol.shape[:3], order),
                   in_axes=-1, out_axes=-1)(vol)
    return out.astype(vol.dtype)


def _sample_window(vol, theta, out_size, start, order: int):
    """Affine-sample only the `out_size` window of the FULL-volume output
    grid starting at `start` — bitwise-identical to
    ``center_crop(affine_sample(vol, theta))`` when ``start`` is the centre
    offset, but touches `prod(out_size)` output voxels instead of the whole
    margined load volume (2.4× fewer gathers at the 116·136² → 96³ shapes
    the train pipeline uses; docs/perf.md lever 2)."""
    vox = _window_vox(vol.shape[:3], theta, out_size, start)
    out = jax.scipy.ndimage.map_coordinates(
        vol.astype(jnp.float32), list(vox), order=order, mode="constant",
        cval=0.0,
    )
    return out.reshape(out_size)


def _window_vox(full, theta, out_size, start):
    """(3, N) fractional source-voxel coords of the `out_size` window of the
    affine output grid (shared helper of the sampler variants)."""
    axes = [
        jnp.linspace(-1.0, 1.0, n)[s : s + o]
        for n, o, s in zip(full, out_size, start)
    ]
    zz, yy, xx = jnp.meshgrid(*axes, indexing="ij")
    coords = jnp.stack([zz, yy, xx, jnp.ones_like(zz)], axis=0).reshape(4, -1)
    src = theta @ coords
    shp = jnp.asarray(full, jnp.float32)
    return (src + 1.0) * 0.5 * (shp[:, None] - 1.0)


def _nearest_window_multichannel(vol, theta, out_size, start):
    """Order-0 window sampling of ALL channels of (D, H, W, C) with ONE
    shared flat-index gather — bitwise-identical to per-channel
    ``map_coordinates(order=0)`` (same round-half-to-even), but the index
    arithmetic runs once and the gather pulls C-channel rows, instead of C
    full gathers (the packed-mask warp was ~nwords × the image's gather
    count; this makes it ~1×)."""
    D, H, W, C = vol.shape
    vox = _window_vox((D, H, W), theta, out_size, start)
    idx = jnp.round(vox)  # round-half-even, matching map_coordinates order=0
    valid = jnp.all(
        (idx >= 0.0)
        & (idx <= jnp.asarray([D - 1, H - 1, W - 1], jnp.float32)[:, None]),
        axis=0,
    )
    ii = jnp.clip(idx, 0.0).astype(jnp.int32)
    flat = (ii[0] * H + ii[1]) * W + ii[2]
    got = jnp.take(vol.reshape(-1, C), jnp.where(valid, flat, 0), axis=0)
    got = jnp.where(valid[:, None], got, jnp.zeros_like(got))
    return got.reshape(*out_size, C)


@partial(jax.jit, static_argnames=("out_size", "start", "order"))
def affine_sample_window(vol, theta, out_size, start, order: int = 1):
    """`affine_sample` fused with a static window crop of the output grid;
    (D,H,W) or (D,H,W,C). Equals ``affine_sample(vol, theta)[window]``."""
    if vol.ndim == 3:
        return _sample_window(vol, theta, out_size, start, order).astype(vol.dtype)
    if order == 0:
        return _nearest_window_multichannel(vol, theta, out_size,
                                            start).astype(vol.dtype)
    out = jax.vmap(lambda c: _sample_window(c, theta, out_size, start, order),
                   in_axes=-1, out_axes=-1)(vol)
    return out.astype(vol.dtype)


def random_affine(img, lab, key, scale=(0.0, 0.0, 0.0), rotate=(30.0, 30.0, 30.0),
                  translate=(0.0, 0.0, 0.0), shear=(0.0, 0.0, 0.0)):
    """Random affine on an image (trilinear) + labels (nearest), like the
    reference's ``random_scale_rotate_translate_3d``. img (D,H,W), lab (D,H,W,C)."""
    theta = _affine_theta(key, scale, rotate, translate, shear)
    return affine_sample(img, theta, order=1), affine_sample(lab, theta, order=0), theta


def center_crop(arr, size: Sequence[int]):
    """Static center crop of the leading three spatial dims."""
    starts = [(s - c) // 2 for s, c in zip(arr.shape[:3], size)]
    sl = tuple(slice(st, st + c) for st, c in zip(starts, size))
    return arr[sl]
