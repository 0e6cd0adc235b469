"""Affine image warping as shear-decomposed batched matmuls (MXU path).

The device-augment affine (``data/augment.py``) samples the output grid with
``map_coordinates`` — an 8-corner trilinear gather per voxel. XLA lowers TPU
gathers to scalar streams, and the driver measured the augment pass at
~140 ms/step at 96³ crops (more than the 96 ms train step it serialises
with; docs/perf.md round 4). This module re-expresses the SAME affine map as
a sequence of one-axis linear resamples:

    M = Rx(a)·Ry(b)·Rz(g)·diag(d)        (the augment's scale+rotate family)
    each rotation = 3 Paeth shears        H(α)·V(β)·H(α), α=-tan(θ/2), β=sinθ
    diag+translate+crop = 3 per-axis 1-D resamples

Every pass is "resample axis u at positions offset linearly by axis v" — a
batched (n_v, n_u_out, n_u_in) matmul with hat-function (linear) weights,
built on device from the traced θ. 10 small einsums ≈ a few GFLOP on the
MXU instead of ~8M gathers.

Semantics: identical affine coordinate map (the pass matrices multiply back
to θ exactly — tested), identical zero (cval=0) borders, but the
interpolation is a COMPOSITION of 1-D lerps instead of one trilinear lerp:
pure scale/translate is exactly trilinear; with rotation the result is the
classic multi-pass-rotation approximation (slightly smoother). That is an
accepted trade for data augmentation. Hardware A/B (round 5,
``artifacts/exp_augment_shear_r5a.log``): 36.6 ms vs 128.0 ms per 96³
augment step — this path is now the DEFAULT image warp;
``RSUPER_AUG_SHEAR=0`` restores the gather path (the golden reference).

The nearest-neighbour label warp is NOT routed here: compounded nearest
passes shift mask edges, and the packed-word gather
(``augment._nearest_window_multichannel``) is exact and already cheap.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

Pass = Tuple[str, Tuple]  # ("shear", (u, v, alpha)) | ("diag", (d, t))


def decompose_affine(theta) -> Tuple[List[Pass], jnp.ndarray]:
    """theta (3, 4) normalized-coordinate affine with M = R·diag(d), d > 0
    (the augment family: rotations × positive anisotropic scale — shear
    params must be zero) → list of passes in APPLICATION order whose
    coordinate-map product is exactly theta.

    Returns (passes, d) — d is diagnostic (the per-axis scales).
    """
    M = theta[:, :3].astype(jnp.float32)
    t = theta[:, 3].astype(jnp.float32)
    d = jnp.sqrt(jnp.sum(M * M, axis=0))  # column norms: M = R·diag(d)
    R = M / d[None, :]

    # Euler extraction for R = rx(a)·ry(b)·rz(g) in the (z, y, x) coordinate
    # convention of augment._affine_theta:
    #   R[0] = [cb·cg, -cb·sg, -sb]
    #   R[1] = [ca·sg - sa·sb·cg, ca·cg + sa·sb·sg, -sa·cb]
    #   R[2] = [sa·sg + ca·sb·cg, sa·cg - ca·sb·sg,  ca·cb]
    b = jnp.arcsin(jnp.clip(-R[0, 2], -1.0, 1.0))
    a = jnp.arctan2(-R[1, 2], R[2, 2])
    g = jnp.arctan2(-R[0, 1], R[0, 0])

    # rotation planes: rx mixes (y, x) = axes (1, 2); ry mixes (z, x) =
    # (0, 2); rz mixes (z, y) = (0, 1). In each plane (p, q) the 2x2 block is
    # [[c, ∓s], [±s, c]]; express [[c, -s], [s, c]] on ordered pair (p, q) as
    # H(α)·V(β)·H(α) with H: p += α·q, V: q += β·p (Paeth).
    def paeth(p, q, th):
        al = -jnp.tan(th / 2.0)
        be = jnp.sin(th)
        return [("shear", (p, q, al)), ("shear", (q, p, be)),
                ("shear", (p, q, al))]

    # match the sign structure: rx(a) has [[ca, -sa], [sa, ca]] on (y, x)
    # rows/cols (1,2); ry(b) = [[cb, -sb], [sb, cb]] on (z, x); rz(g) =
    # [[cg, -sg], [sg, cg]] on (z, y). (ry's -s sits at [0][2] like the
    # others' upper-right — same orientation.)
    passes: List[Pass] = []
    passes += paeth(1, 2, a)  # Rx — applied first (leftmost matrix)
    passes += paeth(0, 2, b)  # Ry
    passes += paeth(0, 1, g)  # Rz
    u = R.T @ t  # fold translation into the final diag pass
    passes.append(("diag", (d, u)))
    return passes, d


def pass_matrix(p: Pass) -> jnp.ndarray:
    """(4, 4) homogeneous normalized-coordinate matrix of one pass (used by
    the exactness test: the product over passes in application order must
    reproduce theta)."""
    if p[0] == "shear":
        u, v, al = p[1]
        m = jnp.eye(4)
        m = m.at[u, v].set(al)
        return m
    dvec, t = p[1]
    m = jnp.eye(4)
    m = m.at[0, 0].set(dvec[0]).at[1, 1].set(dvec[1]).at[2, 2].set(dvec[2])
    m = m.at[:3, 3].set(t)
    return m


def _hat_weights(src_idx, n_in: int):
    """Linear-interpolation weights of fractional source indices against an
    n_in iota — rows sum to 1 in-range and taper to 0 outside (identical to
    map_coordinates' order-1 'constant' cval=0 edges)."""
    iota = jnp.arange(n_in, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src_idx[..., None] - iota))


def _norm_axis(n: int):
    return jnp.linspace(-1.0, 1.0, n)


def _apply_shear(vol, u: int, v: int, alpha):
    """out[..p_u..] = vol sampled at u_norm + α·v_norm (other axes fixed):
    one batched matmul. vol (Z, Y, X), u ≠ v ∈ {0, 1, 2}."""
    n_u, n_v = vol.shape[u], vol.shape[v]
    # fractional source index of every (v, u_out) pair
    src_norm = _norm_axis(n_u)[None, :] + alpha * _norm_axis(n_v)[:, None]
    src_idx = (src_norm + 1.0) * 0.5 * (n_u - 1)
    w = _hat_weights(src_idx, n_u)  # (n_v, n_u_out, n_u_in)
    spec = {
        (0, 1): "yzi,iyx->zyx",
        (0, 2): "xzi,iyx->zyx",
        (1, 0): "zyi,zix->zyx",
        (1, 2): "xyi,zix->zyx",
        (2, 0): "zxi,zyi->zyx",
        (2, 1): "yxi,zyi->zyx",
    }[(u, v)]
    return jnp.einsum(spec, w, vol)


def _apply_diag(vol, d, t, out_size, start):
    """Final per-axis resample at scale d + offset t, emitting only the
    [start, start+out) window of the full output grid (the augment pipeline's
    fused centre crop)."""
    # per-axis: out position p (normalized, on the FULL grid) samples
    # d_ax·p + t_ax
    for ax in range(3):
        n_in = vol.shape[ax]
        full_out = _norm_axis(n_in)[start[ax] : start[ax] + out_size[ax]]
        src_idx = (d[ax] * full_out + t[ax] + 1.0) * 0.5 * (n_in - 1)
        w = _hat_weights(src_idx, n_in)  # (n_out, n_in)
        vol = jnp.moveaxis(jnp.tensordot(w, vol, axes=(1, ax)), 0, ax)
    return vol


def shear_affine_window(vol, theta, out_size, start):
    """MXU equivalent of ``augment.affine_sample_window(vol, theta,
    out_size, start, order=1)`` for a (D, H, W) image — same affine map and
    zero borders, multi-pass linear interpolation (module docstring)."""
    passes, _ = decompose_affine(theta)
    x = vol.astype(jnp.float32)
    for p in passes[:-1]:
        u, v, al = p[1]
        x = _apply_shear(x, u, v, al)
    d, t = passes[-1][1]
    return _apply_diag(x, d, t, tuple(out_size), tuple(start))
