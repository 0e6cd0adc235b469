"""Ball kernels and large-kernel 3D convolution, TPU-native.

R-Super's report-supervision losses are built on convolutions of a 3D volume
with "ball" kernels whose diameter comes from the radiology report (reference:
``rsuper_train/training/losses_foundation.py:1161`` ``create_ball_kernel``,
``:1271`` ``ball_convolution``). The reference materialises a dense
``(k, k, k)`` kernel per tumor and calls cuDNN ``conv3d`` — for reported
diameters of 30-60 mm that is a 40³-80³-tap kernel, far outside the regime
where direct convolution is efficient (and a single-channel conv cannot use
the TPU MXU at all).

TPU-first redesign
------------------
* **FFT-domain convolution** (`fft_ball_conv`): cost is O(P³ log P)
  *independent of the kernel diameter*, maps onto XLA's native FFT, and keeps
  every shape static — the (possibly traced) diameter only enters through the
  *values* of the kernel grid, never through shapes. Volumes are zero-padded
  by the maximum kernel radius so circular wrap-around never touches real
  data, then cropped back.
* Kernel construction is a closed-form elementwise expression on a coordinate
  grid (`ball_kernel_wrapped`), so it fuses into a handful of VPU ops.

Semantics match the reference:
* diameters are rounded up to the next odd integer; the ball radius is
  ``d_odd / 2`` (so a k=7 kernel reaches Euclidean distance 3.5);
* the optional Gaussian fill is ``exp(-r² / (2·(std·R)²))`` truncated at the
  ball boundary and normalised to sum 1 (``losses_foundation.py:1219-1225``).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

# FFT sizes with small prime factors (2, 3, 5, 7) — XLA's FFT is fastest here.
_GOOD_SIZES = sorted(
    {
        2**a * 3**b * 5**c * 7**d
        for a in range(0, 12)
        for b in range(0, 6)
        for c in range(0, 4)
        for d in range(0, 3)
        if 2**a * 3**b * 5**c * 7**d <= 4096
    }
)


def good_fft_size(n: int) -> int:
    """Smallest size >= n whose prime factors are all in {2, 3, 5, 7}."""
    for s in _GOOD_SIZES:
        if s >= n:
            return s
    raise ValueError(f"no good FFT size >= {n}")


def odd_ceil(d):
    """Round up to the next odd integer; works on python scalars and traced values.

    Mirrors the reference's diameter rounding (``losses_foundation.py:1191-1194``).
    """
    if isinstance(d, (int, float)):
        c = math.ceil(d)
        return c + 1 if c % 2 == 0 else c
    c = jnp.ceil(d)
    return jnp.where(jnp.mod(c, 2) == 0, c + 1, c)


def reference_kernel_size(diameter: float) -> int:
    """Concrete kernel box size the reference would allocate: odd(1.2 * odd(ceil(d))).

    (``losses_foundation.py:1196-1201``.) The ball always fits strictly inside
    this box (0.6·d_odd > 0.5·d_odd), so the box never clips the ball — which
    is why the FFT path only needs the ball radius, not the box.
    """
    d_odd = odd_ceil(diameter)
    ks = math.ceil(1.2 * d_odd)
    return ks + 1 if ks % 2 == 0 else ks


def _ball_values(dist2, diameter, gaussian: bool, gaussian_std: float, dtype):
    """Ball (or truncated-Gaussian ball) values from squared distances.

    `diameter` may be traced; only values depend on it.
    """
    d_odd = odd_ceil(jnp.asarray(diameter, jnp.float32))
    radius = d_odd / 2.0
    mask = (dist2 <= radius * radius).astype(dtype)
    if gaussian:
        std = gaussian_std * radius
        vals = jnp.exp(-dist2 / (2.0 * std * std)).astype(dtype) * mask
        return vals / jnp.sum(vals)
    return mask


def ball_kernel(
    diameter: float,
    *,
    gaussian: bool = False,
    gaussian_std: float = 1.5,
    dtype=jnp.float32,
):
    """Concrete (static-diameter) ball kernel, shaped exactly like the reference's
    ``create_ball_kernel`` (``losses_foundation.py:1161-1232``): an odd box of
    size 1.2×d_odd holding a centred ball of radius d_odd/2.

    Use only with a *python* diameter (shapes depend on it); inside jit use
    `ball_kernel_wrapped` / `fft_ball_conv`.
    """
    ks = reference_kernel_size(diameter)
    center = (ks - 1) / 2.0
    c = jnp.arange(ks, dtype=jnp.float32) - center
    dist2 = c[:, None, None] ** 2 + c[None, :, None] ** 2 + c[None, None, :] ** 2
    return _ball_values(dist2, diameter, gaussian, gaussian_std, dtype)


def _wrapped_coords(n: int):
    """Signed offsets for an FFT-periodic grid: index i -> i if i<=n//2 else i-n."""
    a = jnp.arange(n, dtype=jnp.float32)
    return jnp.where(a <= n // 2, a, a - n)


def ball_kernel_wrapped(
    shape,
    diameter,
    *,
    gaussian: bool = False,
    gaussian_std: float = 1.5,
    dtype=jnp.float32,
):
    """Ball kernel laid out on a periodic (FFT-ready) grid of static `shape`,
    centred at index (0,0,0) with negative offsets wrapped to the high end.
    `diameter` may be a traced value.
    """
    cz = _wrapped_coords(shape[0])
    cy = _wrapped_coords(shape[1])
    cx = _wrapped_coords(shape[2])
    dist2 = (
        cz[:, None, None] ** 2 + cy[None, :, None] ** 2 + cx[None, None, :] ** 2
    )
    return _ball_values(dist2, diameter, gaussian, gaussian_std, dtype)


def _padded_shape(spatial, max_diameter):
    """Static padded FFT shape for a given max kernel diameter."""
    max_radius = reference_kernel_size(max_diameter) // 2
    return tuple(good_fft_size(s + max_radius) for s in spatial)


@partial(
    jax.jit,
    static_argnames=("gaussian", "gaussian_std", "max_diameter"),
)
def fft_ball_conv(
    x,
    diameter,
    *,
    gaussian: bool = False,
    gaussian_std: float = 1.5,
    max_diameter: int = 96,
):
    """'Same'-padded 3D convolution of `x` (D, H, W) with a ball kernel.

    Drop-in TPU equivalent of the reference's ``ball_convolution``
    (``losses_foundation.py:1271-1299``) and of the conv inside
    ``isolate_tumor`` (``:1437``): zero boundary conditions, output shape ==
    input shape. `diameter` may be traced; `max_diameter` (static) bounds the
    kernel radius the zero-padding must absorb.
    """
    assert x.ndim == 3, f"expected (D,H,W), got {x.shape}"
    spatial = x.shape
    P = _padded_shape(spatial, max_diameter)
    xpad = jnp.zeros(P, x.dtype).at[: spatial[0], : spatial[1], : spatial[2]].set(x)
    kern = ball_kernel_wrapped(
        P, diameter, gaussian=gaussian, gaussian_std=gaussian_std, dtype=jnp.float32
    )
    Xf = jnp.fft.rfftn(xpad.astype(jnp.float32))
    Kf = jnp.fft.rfftn(kern)
    y = jnp.fft.irfftn(Xf * Kf, s=P)
    return y[: spatial[0], : spatial[1], : spatial[2]].astype(x.dtype)


def _floor_sqrt(t):
    """Exact ``floor(sqrt(t))`` for non-negative t (f32), robust to sqrt
    rounding at perfect squares: two integer-compare corrections pin the
    result (all values involved are exactly representable below 2**24)."""
    f = jnp.floor(jnp.sqrt(jnp.maximum(t, 0.0)))
    f = jnp.where((f + 1.0) * (f + 1.0) <= t, f + 1.0, f)
    return jnp.where(f * f > t, f - 1.0, f)


def ball_count_wrapped(shape, diameter):
    """Voxel count of ``ball_kernel_wrapped(shape, diameter)`` (binary fill)
    WITHOUT materialising the (D, H, W) grid.

    For each (dz, dy) plane-offset pair the admissible integer x-offsets are
    ``|dx| <= sqrt(r² - dz² - dy²)`` intersected with the wrapped offset range
    ``[-(W - W//2 - 1), W//2]`` — a closed-form interval length. O(D·H)
    work instead of O(D·H·W); exact (see `_floor_sqrt`), so the ball loss's
    volume-raise rule (``losses_foundation.py:1431``) is bit-identical.
    `diameter` may be traced.
    """
    d_odd = odd_ceil(jnp.asarray(diameter, jnp.float32))
    r2 = (d_odd / 2.0) ** 2
    cz = _wrapped_coords(shape[0])
    cy = _wrapped_coords(shape[1])
    t = r2 - cz[:, None] ** 2 - cy[None, :] ** 2  # (D, H)
    s = _floor_sqrt(t)
    n = shape[2]
    hi = jnp.minimum(s, float(n // 2))
    lo = jnp.maximum(-s, -float(n - n // 2 - 1))
    cnt = jnp.where(t >= 0.0, jnp.maximum(hi - lo + 1.0, 0.0), 0.0)
    return jnp.sum(cnt)


def ball_count_clipped(shape, center, diameter):
    """Voxel count of ``insert_ball(shape, center, diameter)`` WITHOUT
    materialising it: integer x-range counting per (z, y) pair, O(D·H).

    `center` must hold integer-valued coordinates (as produced by the
    localisation argmax); `diameter` may be traced. Exactly equals
    ``insert_ball(...).sum()`` — this is what makes the ball-growth ladder
    (losses/ball.py) a drop-in replacement for the reference's grow loop
    (``losses_foundation.py:1450-1461``).
    """
    d_odd = odd_ceil(jnp.asarray(diameter, jnp.float32))
    r2 = (d_odd / 2.0) ** 2
    cz, cy, cx = center
    z = jnp.arange(shape[0], dtype=jnp.float32) - cz.astype(jnp.float32)
    y = jnp.arange(shape[1], dtype=jnp.float32) - cy.astype(jnp.float32)
    t = r2 - z[:, None] ** 2 - y[None, :] ** 2  # (D, H)
    s = _floor_sqrt(t)
    cxf = cx.astype(jnp.float32)
    hi = jnp.minimum(cxf + s, float(shape[2] - 1))
    lo = jnp.maximum(cxf - s, 0.0)
    cnt = jnp.where(t >= 0.0, jnp.maximum(hi - lo + 1.0, 0.0), 0.0)
    return jnp.sum(cnt)


def insert_ball(shape, center, diameter):
    """Binary ball of (possibly traced) `diameter` centred at (possibly traced)
    integer coords `center = (cz, cy, cx)` on a static grid `shape`.

    Replaces the reference's dynamic-slice kernel paste (``insert_ball``,
    ``losses_foundation.py:1336-1385``) with a coordinate-mask expression:
    identical result (balls clipped at volume borders), but fully static
    shapes and no gather/scatter.
    """
    d_odd = odd_ceil(jnp.asarray(diameter, jnp.float32))
    radius = d_odd / 2.0
    cz, cy, cx = center
    z = jnp.arange(shape[0], dtype=jnp.float32) - cz.astype(jnp.float32)
    y = jnp.arange(shape[1], dtype=jnp.float32) - cy.astype(jnp.float32)
    x = jnp.arange(shape[2], dtype=jnp.float32) - cx.astype(jnp.float32)
    dist2 = z[:, None, None] ** 2 + y[None, :, None] ** 2 + x[None, None, :] ** 2
    return (dist2 <= radius * radius).astype(jnp.float32)
