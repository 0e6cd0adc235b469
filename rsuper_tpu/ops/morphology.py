"""Binary morphology on 3D volumes, TPU-native.

The reference dilates binary masks by convolving with ball kernels and
thresholding (``rsuper_train/training/losses_foundation.py:22-99``
``dilate_volume`` / ``dilate_volume_conv``), decomposing large radii into
repeated radius-3 passes to keep cuDNN kernels small.

TPU-first redesign
------------------
* Small kernels (<= 9) run as a direct depthwise XLA convolution in NDHWC —
  exactly the reference's single-pass ball.
* Large kernels run as ONE exact Euclidean-ball dilation in the FFT domain
  (count > 0.5 threshold) — a deliberate improvement over the reference's
  repeated-pass decomposition, which only approximates a ball (Minkowski sum
  of small discrete balls). One pass, exact sphere, cost independent of
  radius.

Layout: channels-last. Accepts (D,H,W), (B,D,H,W,C) or any (..., D,H,W,C);
for rank >= 4 the last axis is treated as channels and the three before it as
spatial. Dilation applies per-channel (no cross-channel mixing), matching the
reference's ``groups=C`` conv (``losses_foundation.py:87``).
"""

from __future__ import annotations

import math
import os
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .balls import ball_kernel, ball_kernel_wrapped, good_fft_size

# Large-kernel (k > 9) strategy under method="auto": "fft" = one exact
# Euclidean ball in the FFT domain (size-independent ~3 ms at 96³); "iter" =
# the reference's repeated small-ball decomposition as reduce_window maxes
# (bandwidth-bound, no FFT). Trace-time knob for the bench A/B.
_BIG_METHOD = os.environ.get("RSUPER_DILATE_BIG", "fft")


def binary_union(*masks):
    """Elementwise OR over binary float masks, returned as float."""
    acc = masks[0]
    for m in masks[1:]:
        acc = acc + m
    return (acc > 0).astype(masks[0].dtype)


def _as_ndhwc(x):
    """Normalise input to (N, D, H, W, C); return array + restore function."""
    if x.ndim == 3:  # (D, H, W)
        arr = x[None, ..., None]
        return arr, lambda y: y[0, ..., 0]
    if x.ndim == 4:  # (D, H, W, C)
        arr = x[None]
        return arr, lambda y: y[0]
    if x.ndim == 5:
        return x, lambda y: y
    lead = x.shape[:-4]
    arr = x.reshape((-1,) + x.shape[-4:])
    return arr, lambda y: y.reshape(lead + y.shape[1:])


def _dilate_direct(x, kernel_size: int):
    """Single-pass ball dilation via depthwise NDHWC conv (small kernels)."""
    kern3 = ball_kernel(kernel_size)  # (k, k, k), binary; radius k_odd/2
    k = kern3.shape[0]
    c = x.shape[-1]
    # Depthwise: one spatial kernel replicated per channel.
    kern = jnp.broadcast_to(kern3[..., None, None], (k, k, k, 1, c))
    out = lax.conv_general_dilated(
        x.astype(jnp.float32),
        kern.astype(jnp.float32),
        window_strides=(1, 1, 1),
        padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=c,
    )
    return (out > 0.5).astype(x.dtype)


def _dilate_fft(x, kernel_size: int):
    """Single-pass exact ball dilation in the FFT domain (large kernels)."""
    spatial = x.shape[1:4]
    radius = kernel_size // 2 + 1
    P = tuple(good_fft_size(s + radius) for s in spatial)
    kern = ball_kernel_wrapped(P, kernel_size)
    Kf = jnp.fft.rfftn(kern)

    def one(vol):  # vol: (D, H, W)
        pad = (
            jnp.zeros(P, jnp.float32)
            .at[: spatial[0], : spatial[1], : spatial[2]]
            .set(vol.astype(jnp.float32))
        )
        cnt = jnp.fft.irfftn(jnp.fft.rfftn(pad) * Kf, s=P)
        return cnt[: spatial[0], : spatial[1], : spatial[2]]

    # vmap over batch and channel (both map cleanly onto batched FFTs).
    cnt = jax.vmap(jax.vmap(one, in_axes=-1, out_axes=-1))(x)
    return (cnt > 0.5).astype(x.dtype)


def _dilate_direct_cf(x, kernel_size: int):
    """Spatial-minor direct dilation: x (N, D, H, W) -> conv as (N, 1, D, H, W)
    NCDHW so the stored values keep (H, W) in the tiled minor dims (tiny
    channel counts in TPU lanes pad 42-128x; see ball-loss OOM notes)."""
    kern3 = ball_kernel(kernel_size)
    k = kern3.shape[0]
    out = lax.conv_general_dilated(
        x[:, None].astype(jnp.float32),
        kern3[None, None].astype(jnp.float32),  # (O=1, I=1, k, k, k)
        window_strides=(1, 1, 1),
        padding="SAME",
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )
    return (out[:, 0] > 0.5).astype(x.dtype)


def _axis_max(x, axis: int, size: int):
    pad = size // 2
    dims = [1] * x.ndim
    dims[axis] = size
    padding = [(0, 0)] * x.ndim
    padding[axis] = (pad, pad)
    return lax.reduce_window(x, -jnp.inf, lax.max, tuple(dims), (1,) * x.ndim,
                             padding)


def _ball5_float(x):
    """Un-thresholded ball(2.5) dilation of a non-negative float input via
    ball(2.5) = cube(3) ⊕ cross(1) — shared by the ball5/ball7 paths."""
    sp = range(x.ndim - 3, x.ndim)
    cube = x
    for ax in sp:
        cube = _axis_max(cube, ax, 3)
    out = cube
    for ax in sp:
        out = jnp.maximum(out, _axis_max(cube, ax, 3))
    return out


def _dilate_ball5_cf(x):
    """EXACT ball(radius 2.5) dilation via the decomposition
    ball(2.5) = cube(3) ⊕ cross(1): offsets reachable are all |c|∞<=2 except
    those with two or more coordinates at ±2 — exactly the k=5 discrete ball.
    Implemented as separable reduce_window maxes: ~10 elementwise passes
    instead of a 3D conv (145 ms scalar loop) or FFT (45 ms) on TPU."""
    return (_ball5_float(x.astype(jnp.float32)) > 0.5).astype(x.dtype)


def _axis_pm_max(x, axis: int, offset: int):
    """max(x[.. -offset ..], x[.. +offset ..]) along one axis, zero-padded
    (init value 0 — `x` must be non-negative, as binary masks are): a window
    of 2 taps spread ``2*offset`` apart via window_dilation."""
    dims = [1] * x.ndim
    dims[axis] = 2
    dil = [1] * x.ndim
    dil[axis] = 2 * offset
    padding = [(0, 0)] * x.ndim
    padding[axis] = (offset, offset)
    return lax.reduce_window(x, 0.0, lax.max, tuple(dims), (1,) * x.ndim,
                             padding, window_dilation=tuple(dil))


def _dilate_ball7_cf(x):
    """EXACT ball(radius 3.5) dilation via the decomposition
    ball(3.5) = (ball(2.5) ⊕ cross(1)) ∪ corners{±2}³: offsets with
    x²+y²+z² <= 3.5² are exactly the ball5⊕cross Minkowski sum plus the eight
    (±2,±2,±2) corner shifts (brute-force verified over the 7³ grid; the
    corners factor further into three separable ±2 two-tap windows). ~13
    reduce_window/elementwise passes instead of a 3D conv (scalar-loop on
    TPU) or an FFT (~3 ms per 96³ volume)."""
    f = x.astype(jnp.float32)
    sp = range(x.ndim - 3, x.ndim)
    b5 = _ball5_float(f)
    out = b5
    for ax in sp:
        out = jnp.maximum(out, _axis_max(b5, ax, 3))
    corners = f
    for ax in sp:
        corners = _axis_pm_max(corners, ax, 2)
    out = jnp.maximum(out, corners)
    return (out > 0.5).astype(x.dtype)


def _dilate_ball3_cf(x):
    """EXACT ball(radius 1.5) dilation: offsets with x²+y²+z² <= 1.5² are
    those with at most TWO nonzero ±1 coordinates (the 18-neighbourhood) —
    the union over the three spatial-axis pairs of a separable 2D cube(3).
    Six reduce_window passes + two maxes."""
    f = x.astype(jnp.float32)
    sp = list(range(x.ndim - 3, x.ndim))
    out = None
    for skip in sp:
        plane = f
        for ax in sp:
            if ax != skip:
                plane = _axis_max(plane, ax, 3)
        out = plane if out is None else jnp.maximum(out, plane)
    return (out > 0.5).astype(x.dtype)


def _dilate_iter_cf(x, kernel_size: int):
    """Reference-parity large-kernel dilation: radius decomposed into
    repeated ball(7) passes plus one ball(3)/ball(5) remainder — exactly the
    reference's ``dilate_volume`` (``losses_foundation.py:22-47``,
    full_pass_radius=3), with each per-pass discrete ball identical to its
    conv kernel. The Minkowski sum of small balls over-reaches the single
    Euclidean ball slightly at oblique angles (the reference accepts this);
    every pass is reduce_window maxes, so cost is ~13 bandwidth-bound
    elementwise passes per radius-3 step instead of the size-independent
    ~3 ms FFT — an A/B candidate for the k=31 segment dilation
    (``RSUPER_DILATE_BIG=iter``)."""
    radius = (kernel_size - 1) // 2
    n7, rem = divmod(radius, 3)
    for _ in range(n7):
        x = _dilate_ball7_cf(x)
    if rem == 2:
        x = _dilate_ball5_cf(x)
    elif rem == 1:
        x = _dilate_ball3_cf(x)
    return x


def _separable_max_cf(x, k: int):
    """Exact cube(k) dilation: one reduce_window max per spatial axis."""
    out = x.astype(jnp.float32)
    pad = k // 2
    for axis in range(x.ndim - 3, x.ndim):
        dims = [1] * x.ndim
        dims[axis] = k
        padding = [(0, 0)] * x.ndim
        padding[axis] = (pad, pad)
        out = jax.lax.reduce_window(
            out, -jnp.inf, jax.lax.max, tuple(dims), (1,) * x.ndim, padding
        )
    return (out > 0.5).astype(x.dtype)


def dilate_cube_cf(x, kernel_size: int):
    """Exact cube-kernel dilation for (..., D, H, W) binary arrays — equals
    scipy ``binary_dilation(structure=ones(3³), iterations=(k-1)//2)``."""
    if kernel_size % 2 == 0:
        kernel_size += 1
    if kernel_size <= 1:
        return x
    return _separable_max_cf(x, kernel_size)


def _dilate_maxpool_cf(x, kernel_size: int):
    """Cube-kernel dilation via three separable reduce_window maxes, with the
    reference's ball-compensation size k/sqrt(2) (``dilate_volume_maxpool``,
    ``losses_foundation.py:101-146``). Far cheaper than the exact ball for
    large margins; shape differs at corners (cube vs sphere)."""
    k = max(1, int(kernel_size / math.sqrt(2.0)))
    if k % 2 == 0:
        k += 1
    if k <= 1:
        return x
    return _separable_max_cf(x, k)


@partial(jax.jit, static_argnames=("kernel_size", "method"))
def dilate_cf(x, kernel_size: int, method: str = "auto"):
    """Ball dilation for spatial-minor layouts: `x` is (..., D, H, W) with any
    leading batch/channel dims. Equivalent semantics to `dilate` but keeps
    spatial dims in the TPU-tiled minor positions — use this inside losses
    where channel counts are tiny (lesion space L~3)."""
    if kernel_size % 2 == 0:
        kernel_size += 1
    if kernel_size <= 1:
        return x
    if method == "maxpool":
        return _dilate_maxpool_cf(x, kernel_size)
    if kernel_size == 5 and method in ("auto", "fast"):
        return _dilate_ball5_cf(x)
    if kernel_size == 7 and method in ("auto", "fast"):
        return _dilate_ball7_cf(x)
    if method == "iter" or (
        method == "auto" and kernel_size > 9 and _BIG_METHOD == "iter"
    ):
        return _dilate_iter_cf(x, kernel_size)
    lead = x.shape[:-3]
    flat = x.reshape((-1,) + x.shape[-3:])
    # On TPU, XLA lowers single-channel depthwise conv3d to a scalar-loop
    # fusion (~145 ms for k=7 at 96³ on v5e) while the FFT path costs a few
    # ms regardless of kernel size — so 'auto' means FFT on TPU, and the
    # direct conv only where XLA has a real conv engine (CPU tests).
    use_direct = method == "direct" or (
        method == "auto" and kernel_size <= 9 and jax.default_backend() != "tpu"
    )
    if use_direct:
        out = _dilate_direct_cf(flat, kernel_size)
    else:
        spatial = flat.shape[1:]
        radius = kernel_size // 2 + 1
        P = tuple(good_fft_size(s + radius) for s in spatial)
        kern = ball_kernel_wrapped(P, kernel_size)
        Kf = jnp.fft.rfftn(kern)

        def one(vol):
            pad = (
                jnp.zeros(P, jnp.float32)
                .at[: spatial[0], : spatial[1], : spatial[2]]
                .set(vol.astype(jnp.float32))
            )
            cnt = jnp.fft.irfftn(jnp.fft.rfftn(pad) * Kf, s=P)
            return cnt[: spatial[0], : spatial[1], : spatial[2]]

        out = (jax.vmap(one)(flat) > 0.5).astype(x.dtype)
    return out.reshape(lead + x.shape[-3:])


@partial(jax.jit, static_argnames=("kernel_size", "method"))
def dilate(x, kernel_size: int, method: str = "auto"):
    """Binary dilation of `x` by a Euclidean ball of radius ``odd(kernel_size)/2``.

    Equivalent of the reference's ``dilate_volume`` (``losses_foundation.py:22``)
    with exact single-pass semantics (see module docstring). `kernel_size` is
    static (python int). Values must be binary {0, 1}; output is binary in the
    input dtype.
    """
    if kernel_size % 2 == 0:
        kernel_size += 1
    if kernel_size <= 1:
        return x
    arr, restore = _as_ndhwc(x)
    use_direct = method == "direct" or (
        method == "auto" and kernel_size <= 9 and jax.default_backend() != "tpu"
    )
    if use_direct:
        out = _dilate_direct(arr, kernel_size)
    elif method in ("fft", "auto"):
        out = _dilate_fft(arr, kernel_size)
    else:
        raise ValueError(f"unknown method {method!r}")
    return restore(out)
