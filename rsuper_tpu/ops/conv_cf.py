"""Channel-first 3³ convolution for small channel counts (Pallas, TPU).

Why this exists: XLA:TPU lays conv activations out channels-minor, and the
(8, 128) vector tiling pads the lane (channel) dimension to 128 — at the
full-resolution stages of a 3D U-Net (C = 32) every activation, residual and
gradient carries a 4× padding tax, and profiling showed the full-res stage is
>50% of the R-Super train step (docs/perf.md). Lifting tricks
(space-to-depth) provably trade that padding for an equal factor of extra
FLOPs, so the fix is a kernel that computes the conv in a **channel-first
layout** where the lane dimension is the flattened in-plane space H·W and the
MXU contraction runs over ``3·C_in`` (kw-unrolled).

Shape story: operands live in depth-major channel-first (B, D, C, H, W)
layout — the (B, D, C, H·W) view the kernels consume is then a FREE reshape
(the original (B, C, D, H, W) layout paid ~5 ms/step of transpose copies at
96³). The grid is one (batch, depth-row) program per step; the three depth
taps arrive as separate halo refs (kd−1, kd, kd+1, edge-clamped and masked
to zero); kh taps are ±W lane shifts (zero-filled at the top/bottom rows by
construction); kw taps are ±1 lane shifts with the wrapped w-edge column
masked via an iota-mod-W predicate. Every dot is a strictly 2D MXU matmul
with f32 accumulation — Mosaic supports nothing fancier (multi-dim dot
operands fail with "unsupported shape cast", observed on v5e).

Two dot formulations, selected PER SIGNATURE by hardware calibration
(`tools/calibrate_vmem.py` → `ops/vmem_table.py`):

- **"a" (per-tap)**: 9 dots per depth row of (C_out, 3·C_in) × (3·C_in, S),
  one per (kd, kh) tap. Smallest live set — the only formulation that fits
  the largest whole-plane working sets (the (3·C_out, S) f32 dot output of
  "d" alone is 7 MB at S = 96², C_out = 64).
- **"d" (kh-stacked M)**: each depth tap runs ONE dot of
  (3·C_out, 3·C_in) × (3·C_in, S) with the 3 kh weight rows stacked along
  M, then the kh sum is applied as ±W lane shifts of the OUTPUT slices (the
  shift commutes with the channel contraction, so shifting z after the dot
  equals shifting the input rows before it — verified bit-exact against
  lax.conv_general_dilated in interpret mode). At the dominant
  full-resolution stages (C_out 32–64) this triples the MXU sublane
  occupancy (M = 96–192 of 128-row tiles vs 32–64) and cuts 9 dots/row
  to 3 — but holds a 3× larger f32 dot output live, so VMEM decides where
  it is usable; the calibrator times both and records the faster.

The backward pass is two more kernels: ``dx = conv(dy, flip(w)ᵀ)`` (the same
forward kernel) and a wgrad kernel accumulating ``dw[kd, kh] += dy ⋅ patchᵀ``
("a") or, per depth tap, ``dw[kd] += stack_kh(shift_h(dy, 2−kh)) ⋅ patchᵀ``
("d" — the adjoint of the forward's output shift is the reversed shift of
dy) across the sequential TPU grid.

Non-TPU backends dispatch to ``lax.conv_general_dilated`` with NCDHW
dimension numbers (same math; CPU tests run the XLA path, and the Pallas
path is unit-tested in interpret mode).

Reference parity: this computes exactly ``flax.linen.Conv(features, (3,3,3),
padding='SAME', use_bias=False)`` on transposed operands — see
``tests/test_ops.py`` golden comparisons.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from . import dispatch

# Kernel-signature trace hook: when set, called with a dict describing every
# pallas_call this module is about to dispatch (post channel-chunking, with
# the picked TD/TH) — `ops/trace_shapes.py` uses it to derive the real-model
# shape inventory for the hardware smoke gate and the VMEM calibration table.
# None in production; zero overhead.
_trace_hook = None

# Calibration overrides: force the depth-tile / dot-formulation picks so
# tools/calibrate_vmem.py can measure each (signature, form, TD) cell on
# hardware.
_td_override = None
_form_override = None


def _emit_trace(**sig):
    if _trace_hook is not None:
        _trace_hook(dict(sig))


def _row(ref):
    """(1, 1, C, S) halo/body block → 2D (C, S)."""
    return ref[0, 0]


def _shift_w(x, k, W):
    """kw tap: shift the flattened (C, S) row by k−1 ∈ {−1, 0, +1} lanes,
    masking the column that wrapped across a w-edge."""
    if k == 1:
        return x
    S = x.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1) % W
    if k == 0:  # value from w−1; w = 0 has no left neighbour
        shifted = jnp.concatenate(
            [jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1
        )
        return jnp.where(col == 0, jnp.zeros_like(shifted), shifted)
    shifted = jnp.concatenate(  # value from w+1; w = W−1 has no right one
        [x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1
    )
    return jnp.where(col == W - 1, jnp.zeros_like(shifted), shifted)


def _shift_h(x, k, W):
    """kh tap: shift by (k−1)·W lanes — rows are W apart in the flattened
    layout, and the zero fill lands exactly on the h-edge rows."""
    if k == 1:
        return x
    zeros = jnp.zeros_like(x[:, :W])
    if k == 0:
        return jnp.concatenate([zeros, x[:, :-W]], axis=1)
    return jnp.concatenate([x[:, W:], zeros], axis=1)


def _kw_patch(row, W):
    """(3·C, S) kw-stacked patch of one depth row: the kw taps of the
    contraction stacked along K so a single dot contracts 3·C_in."""
    return jnp.concatenate([_shift_w(row, kw, W) for kw in range(3)], axis=0)


def _norm_relu_row(row, st_ref):
    """Fused pre-activation epilogue on a (C, L) row: relu(x·scale + shift)
    with per-channel f32 stats from the (1, 2, C, 1) stats block (scale =
    1/σ, shift = −μ/σ — instance-norm). The (C, 1) → (C, L) lane broadcast
    is a native VPU op; computing this at row-load time is what removes the
    normalize/relu HBM round-trips between IN and conv (docs/perf.md lever 1)."""
    scale = st_ref[0, 0]  # (C, 1) f32
    shift = st_ref[0, 1]
    v = row.astype(jnp.float32) * scale + shift
    return jnp.maximum(v, 0.0).astype(row.dtype)


def _tile_rows_and_valids(xp_ref, xm_ref, xn_ref, t: int, TD: int,
                          st_ref=None):
    """Depth taps (d−1, d, d+1) for output row `t` of a TD-row tile, plus 0/1
    validity scalars for the clamped edge halos. Contributions are scaled
    AFTER the dot instead of zeroing row copies up front — at 128³
    (S = 16384 lanes) the masked-row buffers alone were the difference
    between fitting and blowing scoped VMEM.

    Interior rows (0 < t < TD−1) take all taps from the tile body; only the
    tile's first/last rows touch the halo refs. With `st_ref` the rows pass
    through the fused IN+relu epilogue (zero SAME-padding remains exact:
    relu(norm(·)) pads with 0 in activation space, and edge contributions
    are masked post-dot)."""
    d = pl.program_id(1)
    nd = pl.num_programs(1)
    one = jnp.float32(1.0)
    prev = xm_ref[0, t - 1] if t > 0 else _row(xp_ref)
    nxt = xm_ref[0, t + 1] if t < TD - 1 else _row(xn_ref)
    rows = [prev, xm_ref[0, t], nxt]
    if st_ref is not None:
        rows = [_norm_relu_row(r, st_ref) for r in rows]
    valids = [
        jnp.where(d == 0, 0.0, one) if t == 0 else one,
        one,
        jnp.where(d == nd - 1, 0.0, one) if t == TD - 1 else one,
    ]
    return rows, valids


def _fwd_kernel(W: int, concat_kw: bool, TD: int, fuse: bool, *args):
    """One (batch, TD-depth-row tile) program: y[co, s] = Σ W[kd,kh] @ patch.

    `concat_kw` picks the dot shape: kw-stacked K = 3·C_in dots (best MXU
    utilisation) when the (3·C_in, S) patch fits VMEM, else 27 per-tap
    K = C_in dots (no patch buffer — needed at 128³ where S = 16384 lanes
    blows the scoped-vmem budget). `TD` rows per grid step amortise grid and
    halo overhead on small planes (48³ rows are only 0.3 MB). `fuse` adds a
    stats ref and applies the IN+relu epilogue to rows at load time."""
    if fuse:
        xp_ref, xm_ref, xn_ref, st_ref, w_ref, y_ref = args
    else:
        xp_ref, xm_ref, xn_ref, w_ref, y_ref = args
        st_ref = None
    Ci = xm_ref.shape[2]
    for t in range(TD):
        rows, valids = _tile_rows_and_valids(xp_ref, xm_ref, xn_ref, t, TD,
                                             st_ref)
        acc = None
        for kd in range(3):
            for kh in range(3):
                if concat_kw:
                    patch = _kw_patch(_shift_h(rows[kd], kh, W), W)
                    part = jax.lax.dot_general(
                        w_ref[kd, kh],
                        patch,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * valids[kd]
                    acc = part if acc is None else acc + part
                else:
                    # explicit f32 casts: Mosaic mis-lowers small-K bf16 dots
                    # into an invalid bf16->f32 vector.broadcast (v5e, 128³)
                    xkh = _shift_h(rows[kd], kh, W).astype(jnp.float32)
                    for kw in range(3):
                        part = jax.lax.dot_general(
                            w_ref[kd, kh, :, kw * Ci : (kw + 1) * Ci].astype(
                                jnp.float32
                            ),
                            _shift_w(xkh, kw, W),
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ) * valids[kd]
                        acc = part if acc is None else acc + part
        y_ref[0, t] = acc.astype(y_ref.dtype)


def _wgrad_kernel(W: int, concat_kw: bool, TD: int, fuse: bool, *args):
    """Accumulate dw[kd, kh, co, 3·ci] += dy ⋅ patchᵀ over the sequential
    grid (same patch construction / mode switch as the forward). `fuse`
    recomputes the IN+relu activation from raw x rows + stats, so the
    activation tensor is never materialized for the weight gradient."""
    if fuse:
        xp_ref, xm_ref, xn_ref, st_ref, dy_ref, dw_ref = args
    else:
        xp_ref, xm_ref, xn_ref, dy_ref, dw_ref = args
        st_ref = None
    b = pl.program_id(0)
    Ci = xm_ref.shape[2]

    @pl.when((b == 0) & (pl.program_id(1) == 0))
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    for t in range(TD):
        rows, valids = _tile_rows_and_valids(xp_ref, xm_ref, xn_ref, t, TD,
                                             st_ref)
        dy = dy_ref[0, t]  # (Co, S)
        for kd in range(3):
            for kh in range(3):
                if concat_kw:
                    patch = _kw_patch(_shift_h(rows[kd], kh, W), W)
                    part = jax.lax.dot_general(
                        dy,
                        patch,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (Co, 3·Ci)
                    dw_ref[kd, kh] += part * valids[kd]
                else:
                    xkh = _shift_h(rows[kd], kh, W).astype(jnp.float32)
                    dy32 = dy.astype(jnp.float32)
                    for kw in range(3):
                        part = jax.lax.dot_general(
                            dy32,
                            _shift_w(xkh, kw, W),
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # (Co, Ci)
                        dw_ref[kd, kh, :, kw * Ci : (kw + 1) * Ci] += (
                            part * valids[kd]
                        )


def _fwd_kernel_d(W: int, Co: int, TD: int, fuse: bool, *args):
    """Formulation-"d" whole-plane forward: one (3·C_out, 3·C_in) × (3·C_in,
    S) dot per depth tap (kh weight rows stacked along M), kh sum applied as
    ±W lane shifts of the dot-output slices (exact at whole planes: the
    shift's zero fill lands on the h-edge rows). 3 dots/row at 3× the MXU
    sublane occupancy of formulation "a"."""
    if fuse:
        xp_ref, xm_ref, xn_ref, st_ref, w_ref, y_ref = args
    else:
        xp_ref, xm_ref, xn_ref, w_ref, y_ref = args
        st_ref = None
    for t in range(TD):
        rows, valids = _tile_rows_and_valids(xp_ref, xm_ref, xn_ref, t, TD,
                                             st_ref)
        acc = None
        for kd in range(3):
            patch = _kw_patch(rows[kd], W)
            z = jax.lax.dot_general(
                w_ref[kd], patch,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * valids[kd]  # (3·Co, S)
            for kh in range(3):
                part = _shift_h(z[kh * Co:(kh + 1) * Co], kh, W)
                acc = part if acc is None else acc + part
        y_ref[0, t] = acc.astype(y_ref.dtype)


def _wgrad_kernel_d(W: int, Co: int, TD: int, fuse: bool, *args):
    """Formulation-"d" whole-plane wgrad: the adjoint of the forward's
    output shift is the REVERSED shift of dy, so stacking
    ``shift_h(dy, 2−kh)`` along M gives the same kh-stacked
    (3·C_out, 3·C_in) dot shape — one dot per depth tap."""
    if fuse:
        xp_ref, xm_ref, xn_ref, st_ref, dy_ref, dw_ref = args
    else:
        xp_ref, xm_ref, xn_ref, dy_ref, dw_ref = args
        st_ref = None
    b = pl.program_id(0)

    @pl.when((b == 0) & (pl.program_id(1) == 0))
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    for t in range(TD):
        rows, valids = _tile_rows_and_valids(xp_ref, xm_ref, xn_ref, t, TD,
                                             st_ref)
        dy = dy_ref[0, t]  # (Co, S)
        dY = jnp.concatenate(
            [_shift_h(dy, 2 - kh, W) for kh in range(3)], axis=0)  # (3·Co, S)
        for kd in range(3):
            patch = _kw_patch(rows[kd], W)
            part = jax.lax.dot_general(
                dY, patch,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (3·Co, 3·Ci)
            dw_ref[kd] += part * valids[kd]


def _patch27(rows_v, W: int):
    """(27·Ci, S) full-tap patch: every (kd, kh, kw) shift of the three
    depth rows stacked along the contraction, ordered (kd, kh, kw, ci) to
    match `_prep_w_f`. Rows must already carry their depth-edge validity
    (multiplied in, not masked post-dot — kd lives inside K here). f32:
    the stacked K is small (form "f" is gated to tiny Ci) and small-K bf16
    dots mis-lower on Mosaic (see _fwd_kernel's per-tap branch)."""
    blocks = []
    for kd in range(3):
        p = _kw_patch(rows_v[kd], W).astype(jnp.float32)
        for kh in range(3):
            blocks.append(_shift_h(p, kh, W))
    return jnp.concatenate(blocks, axis=0)


def _patch9(row, W: int):
    """(9·Ci, S) kh/kw-stacked patch of ONE depth row, ordered (kh, kw, ci)
    to match `_prep_w_e`. kw-stack first, then the kh shift of the stacked
    block (the two shifts commute — both are lane permutations with
    edge-zero fill)."""
    p = _kw_patch(row, W)
    return jnp.concatenate([_shift_h(p, kh, W) for kh in range(3)], axis=0)


def _fwd_kernel_e(W: int, TD: int, fuse: bool, *args):
    """Formulation-"e" whole-plane forward: per depth tap, ONE
    (Co, 9·Ci) × (9·Ci, S) dot — the kh and kw taps stacked into the
    contraction. vs "a" (9 dots of K=3·Ci): 3× fewer dots and, at Ci=48,
    K=432 fills 84% of its 128-deep MXU tiles where K=144 fills 56%. Depth
    validity stays post-dot (kd remains the loop); fused IN+relu epilogue
    supported (rows normed at load, zero fill lands in activation space)."""
    if fuse:
        xp_ref, xm_ref, xn_ref, st_ref, w_ref, y_ref = args
    else:
        xp_ref, xm_ref, xn_ref, w_ref, y_ref = args
        st_ref = None
    for t in range(TD):
        rows, valids = _tile_rows_and_valids(xp_ref, xm_ref, xn_ref, t, TD,
                                             st_ref)
        acc = None
        for kd in range(3):
            part = jax.lax.dot_general(
                w_ref[kd], _patch9(rows[kd], W),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * valids[kd]
            acc = part if acc is None else acc + part
        y_ref[0, t] = acc.astype(y_ref.dtype)


def _wgrad_kernel_e(W: int, TD: int, fuse: bool, *args):
    """Formulation-"e" wgrad: dw[kd, co, 9·ci] += dy ⋅ patch9ᵀ — one dot
    per depth tap with N=9·Ci (vs "a"'s three N=3·Ci dots)."""
    if fuse:
        xp_ref, xm_ref, xn_ref, st_ref, dy_ref, dw_ref = args
    else:
        xp_ref, xm_ref, xn_ref, dy_ref, dw_ref = args
        st_ref = None
    b = pl.program_id(0)

    @pl.when((b == 0) & (pl.program_id(1) == 0))
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    for t in range(TD):
        rows, valids = _tile_rows_and_valids(xp_ref, xm_ref, xn_ref, t, TD,
                                             st_ref)
        dy = dy_ref[0, t]
        for kd in range(3):
            part = jax.lax.dot_general(
                dy, _patch9(rows[kd], W),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Co, 9·Ci)
            dw_ref[kd] += part * valids[kd]


def _fwd_kernel_f(W: int, TD: int, *args):
    """Formulation-"f" whole-plane forward for TINY C_in (the 1→32 stem
    class): ONE (Co, 27·Ci) × (27·Ci, S) dot per output row instead of 9
    K=3·Ci dots — at Ci=1 formulation "a" runs 9 dots of K=3 (<3% of a
    128-deep MXU pass each); stacking every tap into K cuts the MXU pass
    count ~9× for the same VPU shift work. Unfused only (the stem conv has
    no IN preactivation)."""
    xp_ref, xm_ref, xn_ref, w_ref, y_ref = args
    for t in range(TD):
        rows, valids = _tile_rows_and_valids(xp_ref, xm_ref, xn_ref, t, TD)
        rows_v = [r * v.astype(r.dtype) for r, v in zip(rows, valids)]
        patch = _patch27(rows_v, W)
        acc = jax.lax.dot_general(
            w_ref[...].astype(jnp.float32), patch,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y_ref[0, t] = acc.astype(y_ref.dtype)


def _wgrad_kernel_f(W: int, TD: int, *args):
    """Formulation-"f" wgrad: dw[co, 27·ci] += dy ⋅ patch27ᵀ — one dot per
    row (vs 9 N=3·Ci dots in "a"; at Ci=1 those waste >95% of every MXU
    pass on N padding)."""
    xp_ref, xm_ref, xn_ref, dy_ref, dw_ref = args
    b = pl.program_id(0)

    @pl.when((b == 0) & (pl.program_id(1) == 0))
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    for t in range(TD):
        rows, valids = _tile_rows_and_valids(xp_ref, xm_ref, xn_ref, t, TD)
        rows_v = [r * v.astype(r.dtype) for r, v in zip(rows, valids)]
        patch = _patch27(rows_v, W)
        dw_ref[...] += jax.lax.dot_general(
            dy_ref[0, t].astype(jnp.float32), patch,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _fwd_kernel_g(W: int, Co: int, TD: int, *args):
    """Formulation-"g" whole-plane forward for TINY C_out (the 32→1 stem
    dgrad / outc class): per depth tap, ONE (9·Co, Ci) × (Ci, S) dot with
    the (kh, kw) taps stacked along M, kh/kw applied as output shifts of
    the dot slices (same direction as the input shifts they replace — the
    shifted-z alignment identity formulation "d" uses for kh, extended to
    kw). At Co=1 formulation "a" runs M=1 dots (<1% sublane occupancy);
    "g" runs M=9 and 3× fewer dots. Unfused only."""
    xp_ref, xm_ref, xn_ref, w_ref, y_ref = args
    for t in range(TD):
        rows, valids = _tile_rows_and_valids(xp_ref, xm_ref, xn_ref, t, TD)
        acc = None
        for kd in range(3):
            z = jax.lax.dot_general(
                w_ref[kd].astype(jnp.float32),
                rows[kd].astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * valids[kd]  # (9·Co, S)
            for kh in range(3):
                for kw in range(3):
                    sl = z[(kh * 3 + kw) * Co : (kh * 3 + kw + 1) * Co]
                    part = _shift_h(_shift_w(sl, kw, W), kh, W)
                    acc = part if acc is None else acc + part
        y_ref[0, t] = acc.astype(y_ref.dtype)


def _shift_h_ht(body, hp, hn, k: int, W: int):
    """kh tap on an H-tiled (C, TH·W) tile: the row shifted in from outside
    the tile comes from the (C, W) halo refs instead of zero fill. Halos are
    pre-masked to zero at the volume's h edges by the caller."""
    if k == 1:
        return body
    if k == 0:
        return jnp.concatenate([hp, body[:, :-W]], axis=1)
    return jnp.concatenate([body[:, W:], hn], axis=1)


def _ht_rows(refs, h, nh, st_ref=None):
    """Unpack the 9 H-tiled data refs into per-depth (body, halo_prev,
    halo_next) rows with the h-edge halos zeroed. Because the MXU dot
    contracts only over channels, output lane l depends only on patch lane l
    — so zeroing the invalid halo LANES (not whole contributions) is exact at
    the h = 0 / h = H−1 volume edges. With `st_ref`, rows pass through the
    fused IN+relu epilogue BEFORE edge-zeroing (padding must be zero in
    activation space)."""
    (xp, xm, xn, pp, pm, pn, qp, qm, qn) = refs
    norm = ((lambda r: _norm_relu_row(r, st_ref)) if st_ref is not None
            else (lambda r: r))
    bodies = [norm(_row(xp)), norm(_row(xm)), norm(_row(xn))]
    hps, hns = [], []
    for ref in (pp, pm, pn):
        r = norm(_row(ref))
        hps.append(jnp.where(h == 0, jnp.zeros_like(r), r))
    for ref in (qp, qm, qn):
        r = norm(_row(ref))
        hns.append(jnp.where(h == nh - 1, jnp.zeros_like(r), r))
    return bodies, hps, hns


def _depth_valids(d, nd):
    one = jnp.float32(1.0)
    return [jnp.where(d == 0, 0.0, one), one, jnp.where(d == nd - 1, 0.0, one)]


def _fwd_kernel_ht(W: int, fuse: bool, *args):
    """One (batch, depth-row, H-tile) program of the H-tiled forward:
    y[co, l] = Σ_{kd,kh} vd[kd] · W[kd,kh] @ patch[kd,kh][:, l].

    Exists because whole (C, H·W) planes blow the ~16 MB scoped-VMEM budget
    beyond ~96² in-plane voxels (observed at 128³ on v5e in every whole-plane
    dot mode) — H-tiles keep the working set at (C, TH·W)."""
    if fuse:
        *refs, st_ref, w_ref, y_ref = args
    else:
        *refs, w_ref, y_ref = args
        st_ref = None
    d, nd = pl.program_id(1), pl.num_programs(1)
    h, nh = pl.program_id(2), pl.num_programs(2)
    bodies, hps, hns = _ht_rows(refs, h, nh, st_ref)
    valids = _depth_valids(d, nd)
    acc = None
    for kd in range(3):
        for kh in range(3):
            xkh = _shift_h_ht(bodies[kd], hps[kd], hns[kd], kh, W)
            patch = jnp.concatenate(
                [_shift_w(xkh, kw, W) for kw in range(3)], axis=0
            )
            part = jax.lax.dot_general(
                w_ref[kd, kh],
                patch,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * valids[kd]
            acc = part if acc is None else acc + part
    y_ref[0, 0] = acc.astype(y_ref.dtype)


def _wgrad_kernel_ht(W: int, fuse: bool, *args):
    """H-tiled wgrad: dw[kd, kh] += dy_tile ⋅ patchᵀ over the sequential
    (B, D, H/TH) grid."""
    if fuse:
        *refs, st_ref, dy_ref, dw_ref = args
    else:
        *refs, dy_ref, dw_ref = args
        st_ref = None
    d, nd = pl.program_id(1), pl.num_programs(1)
    h, nh = pl.program_id(2), pl.num_programs(2)

    @pl.when((pl.program_id(0) == 0) & (d == 0) & (h == 0))
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    bodies, hps, hns = _ht_rows(refs, h, nh, st_ref)
    valids = _depth_valids(d, nd)
    dy = dy_ref[0, 0]  # (Co, TH·W)
    for kd in range(3):
        for kh in range(3):
            xkh = _shift_h_ht(bodies[kd], hps[kd], hns[kd], kh, W)
            patch = jnp.concatenate(
                [_shift_w(xkh, kw, W) for kw in range(3)], axis=0
            )
            part = jax.lax.dot_general(
                dy,
                patch,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Co, 3·Ci)
            dw_ref[kd, kh] += part * valids[kd]


def _fwd_kernel_ht_d(W: int, Co: int, fuse: bool, *args):
    """Formulation-"d" H-tiled forward: the dot runs over the h-EXTENDED
    tile (halo row + body + halo row, (TH+2)·W lanes), and each kh output
    slice of the (3·C_out, (TH+2)·W) dot result is read at its kh-shifted
    lane window — no separate input shift per tap."""
    if fuse:
        *refs, st_ref, w_ref, y_ref = args
    else:
        *refs, w_ref, y_ref = args
        st_ref = None
    d, nd = pl.program_id(1), pl.num_programs(1)
    h, nh = pl.program_id(2), pl.num_programs(2)
    bodies, hps, hns = _ht_rows(refs, h, nh, st_ref)
    valids = _depth_valids(d, nd)
    THW = bodies[0].shape[-1]
    acc = None
    for kd in range(3):
        ext = jnp.concatenate([hps[kd], bodies[kd], hns[kd]], axis=1)
        patch = _kw_patch(ext, W)  # (3·Ci, (TH+2)·W)
        z = jax.lax.dot_general(
            w_ref[kd], patch,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * valids[kd]  # (3·Co, (TH+2)·W)
        for kh in range(3):
            part = z[kh * Co:(kh + 1) * Co, kh * W: kh * W + THW]
            acc = part if acc is None else acc + part
    y_ref[0, 0] = acc.astype(y_ref.dtype)


def _wgrad_kernel_ht_d(W: int, Co: int, fuse: bool, *args):
    """Formulation-"d" H-tiled wgrad. Shifting dy (the adjoint side) instead
    of x means x needs NO h-halo refs at all — dy brings its own single-row
    halos — so this kernel's input working set is smaller than "a"'s."""
    if fuse:
        xp, xm, xn, st_ref, dyb, dyp, dyn, dw_ref = args
    else:
        xp, xm, xn, dyb, dyp, dyn, dw_ref = args
        st_ref = None
    d, nd = pl.program_id(1), pl.num_programs(1)
    h, nh = pl.program_id(2), pl.num_programs(2)

    @pl.when((pl.program_id(0) == 0) & (d == 0) & (h == 0))
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    if st_ref is not None:
        bodies = [_norm_relu_row(_row(r), st_ref) for r in (xp, xm, xn)]
    else:
        bodies = [_row(r) for r in (xp, xm, xn)]
    valids = _depth_valids(d, nd)
    THW = bodies[0].shape[-1]
    p = jnp.where(h == 0, jnp.zeros_like(_row(dyp)), _row(dyp))
    n = jnp.where(h == nh - 1, jnp.zeros_like(_row(dyn)), _row(dyn))
    dyext = jnp.concatenate([p, _row(dyb), n], axis=1)  # (Co, (TH+2)·W)
    dY = jnp.concatenate(
        [dyext[:, (2 - kh) * W: (2 - kh) * W + THW] for kh in range(3)],
        axis=0)  # (3·Co, TH·W)
    for kd in range(3):
        patch = _kw_patch(bodies[kd], W)
        part = jax.lax.dot_general(
            dY, patch,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (3·Co, 3·Ci)
        dw_ref[kd] += part * valids[kd]


def _dy_specs_ht(Co, D, H, W, TH):
    """Body + h-halo row specs for the dy operand of the "d" H-tiled wgrad
    (same W-row-unit indexing trick as `_halo_specs_ht`)."""
    def at(hi):
        return lambda b, d, h: (b, d, 0, hi(h))
    h_body = lambda h: h
    h_prev = lambda h: jnp.maximum(h * TH - 1, 0)
    h_next = lambda h: jnp.minimum((h + 1) * TH, H - 1)
    return [
        pl.BlockSpec((1, 1, Co, TH * W), at(h_body)),
        pl.BlockSpec((1, 1, Co, W), at(h_prev)),
        pl.BlockSpec((1, 1, Co, W), at(h_next)),
    ]


def _halo_specs_ht(Ci, D, H, W, TH):
    """BlockSpecs for the 9 data refs of the H-tiled kernels, over a
    (B, D, Ci, H·W) operand viewed in two block granularities: (Ci, TH·W)
    body tiles indexed by h-tile, and (Ci, W) single-row h-halos indexed in
    W-row units (legal: W is 128-divisible on this path). Edge indices are
    clamped; the kernel masks their contribution."""
    nh = H // TH

    def at(di, hi):
        return lambda b, d, h: (b, di(d), 0, hi(h))

    d_prev = lambda d: jnp.maximum(d - 1, 0)
    d_mid = lambda d: d
    d_next = lambda d: jnp.minimum(d + 1, D - 1)
    h_body = lambda h: h
    h_prev = lambda h: jnp.maximum(h * TH - 1, 0)
    h_next = lambda h: jnp.minimum((h + 1) * TH, H - 1)
    specs = []
    for di in (d_prev, d_mid, d_next):  # body tiles
        specs.append(pl.BlockSpec((1, 1, Ci, TH * W), at(di, h_body)))
    for di in (d_prev, d_mid, d_next):  # halo row above the tile
        specs.append(pl.BlockSpec((1, 1, Ci, W), at(di, h_prev)))
    for di in (d_prev, d_mid, d_next):  # halo row below the tile
        specs.append(pl.BlockSpec((1, 1, Ci, W), at(di, h_next)))
    return specs


def _pick_th(H: int, W: int, Cmax: int) -> int:
    """H rows per tile: big tiles amortise halo/grid overhead; the (3·C, L)
    patch, the accumulator, and (formulation "d") the (3·C, L) f32 dot
    output must stay well inside scoped VMEM. The 6·C factor covers the
    worst of both formulations; it is NOT TH-neutral vs the old 4·C factor
    (at Cmax=96, W=128 — the 128³ 64→96 H-tiled conv — TH drops 16→8), so
    the measured HT form verdicts are keyed to the TH they were timed at
    (vmem_table.CALIBRATED_TH); _pick_form_ht discards a verdict whose TH
    no longer matches."""
    for th in (64, 32, 16, 8, 4, 2, 1):
        if H % th == 0 and 6 * Cmax * th * W * 4 <= 4_000_000:
            return th
    return 1


def _ht_supported(H: int, W: int) -> bool:
    # halo blocks are single (C, W) rows: Mosaic needs the lane dim of every
    # block 128-divisible (or equal to the array dim, impossible for a row)
    return W % 128 == 0


def _halo_specs(Ci, D, S, TD):
    """BlockSpecs for the (prev-row, TD-row body, next-row) trio of a
    (B, D, Ci, S) operand — depth-major so the blocked dims are OUTER dims
    (Pallas requires the last two block dims be (8, 128)-divisible or full);
    edge indices are clamped (the kernel masks their contribution to zero at
    the volume boundaries)."""
    return [
        pl.BlockSpec(
            (1, 1, Ci, S), lambda b, d: (b, jnp.maximum(d * TD - 1, 0), 0, 0)
        ),
        pl.BlockSpec((1, TD, Ci, S), lambda b, d: (b, d, 0, 0)),
        pl.BlockSpec(
            (1, 1, Ci, S),
            lambda b, d: (b, jnp.minimum((d + 1) * TD, D - 1), 0, 0),
        ),
    ]


# Whole-plane TD budget, calibrated against real Mosaic scoped-VMEM
# allocations on v5e (the 16 MB limit): the model below predicts 15.3M for
# (Ci=32, Co=32, TD=4, 96²) which FITS on hardware (the production full-res
# stage), and 17.7M for (Ci=48, Co=64, TD=2, 96²) which FAILS (observed
# 19.23M — the paired conv+shortcut call). 15.5M admits every measured-good
# configuration and rejects the measured-bad one with margin.
_TD_VMEM_BUDGET = 15_500_000


def _td_vmem_est(td: int, S: int, Ci: int, Co: int, itemsize: int,
                 wgrad: bool, form: str = "a") -> int:
    """Scoped-VMEM working-set estimate of one whole-plane grid step:
    3 TD-row input halo streams + the TD-row output (or dy) stream + the
    (3·C_in, S) kw-concat patch + the 3 activated depth rows, plus the
    formulation's live dot outputs — "a" forward: two f32 (C_out, S)
    accumulators (`part` + `acc`); "d" forward: the (3·C_out, S) f32 dot
    output z + the accumulator + one shifted slice; "a" wgrad: the dy row
    copy + the small f32 dw block; "d" wgrad: the kh-stacked (3·C_out, S)
    dY copy. The wgrad streams carry a ×2 double-buffer factor — calibrated
    to the round-2 v5e observation that a single-stream budget put the 64³
    wgrad tile 304K over the scoped limit at TD=4 while TD=2 fits; the
    forward calibration points are in _TD_VMEM_BUDGET's comment."""
    streams = 3 * td * Ci + td * Co
    scratch = 3 * Ci + 3 * Ci  # kw-concat patch + activated depth rows
    if form == "e":
        scratch += 9 * Ci  # the kh/kw-stacked patch
    if wgrad:
        dy_copies = 3 * Co if form == "d" else Co
        return S * itemsize * (2 * streams + scratch + dy_copies) \
            + 2 * 9 * Co * 3 * Ci * 4
    if form == "f":
        live_f32 = Co + 27 * Ci + 3 * Ci  # acc + f32 patch + kw_patch temp
    elif form == "g":
        live_f32 = 9 * Co + 2 * Co + Ci  # z + acc/part + f32 row cast
    else:
        live_f32 = 5 * Co if form == "d" else 2 * Co
    if form == "d":
        # Mosaic double-buffers the pipelined grid streams (the round-4b
        # smoke OOM dumps show a 2·TD-row output block); form "a"'s budget
        # constant absorbed that empirically, but "d" needs it explicit —
        # its 9216/1→32 TD=8 estimate was 11.2M vs 19.4M observed.
        streams *= 2
    return S * itemsize * (streams + scratch) + S * live_f32 * 4


def _analytic_td(D: int, S: int, Ci: int, Co: int, itemsize: int,
                 wgrad: bool, fused: bool, form: str) -> int:
    for td in (8, 4, 2):
        if D % td != 0:
            continue
        est = _td_vmem_est(td, S, Ci, Co, itemsize, wgrad, form)
        if fused:
            est += td * 3 * Ci * S * 4
        if est <= _TD_VMEM_BUDGET:
            return td
    return 1


def _resolve_plane(D: int, S: int, Ci: int, Co: int, itemsize: int,
                   wgrad: bool, fused: bool) -> tuple:
    """(form, td) for a whole-plane kernel: dot formulation AND rows per
    grid step, trading MXU occupancy ("d" stacks 3 kh rows along M) against
    scoped VMEM (the working sets differ per formulation).

    The primary source of truth is the HARDWARE-MEASURED table
    (`ops/vmem_table.py`, generated by `tools/calibrate_vmem.py` from real
    Mosaic compiles + timings of every kernel signature the MedFormer
    configs emit): two rounds of analytic budgets each mispredicted a new
    shape (round 2: the paired conv at 19.23M; round 3: the 128³ pair at
    Ci=64→Co=128/S=4096, 18.93M — the estimator said 12.6M because it
    missed the fused epilogue's per-row f32 temporaries and Mosaic's tap
    liveness). PREFERRED_FORM holds the measured-FASTER formulation per
    signature; MEASURED_TD holds each formulation's largest-lowering TD
    (0 = even TD=1 fails). Unmeasured shapes fall back to the analytic
    estimate plus a conservative fused-epilogue term (TD·3·Ci·S·4 bytes of
    live f32 normalize temps — calibrated to the observed 18.93M); the
    traced smoke gate catches any survivor on hardware before a training
    run can hit it."""
    from .vmem_table import MEASURED_TD, PREFERRED_FORM

    kind = "wgrad" if wgrad else "fwd"
    key = (kind, S, Ci, Co, itemsize, bool(fused))

    def best_td(form):
        cap = MEASURED_TD.get((form,) + key)
        if cap == 0:
            return 0
        if cap is not None:
            for td in (8, 4, 2):
                if D % td == 0 and td <= cap:
                    return td
            return 1
        return _analytic_td(D, S, Ci, Co, itemsize, wgrad, fused, form)

    if _form_override is not None:
        form = _form_override
        if not _form_eligible(form, S, Ci, Co, fused, wgrad,
                              itemsize):
            form = "a"
        td = _td_override if _td_override is not None else max(best_td(form), 1)
        return form, td
    form = PREFERRED_FORM.get(key)
    if form is not None and not _form_eligible(form, S, Ci, Co, fused,
                                                wgrad, itemsize):
        form = None  # stale table row for a form this call can't run
    if form is None:
        # Unmeasured signature: form "a" is the only formulation proven to
        # lower at every calibrated signature; "d" failed Mosaic lowering
        # outright at four production plane signatures the analytic VMEM
        # estimate accepted (round-4c smoke, MEASURED_TD cap 0). Never pick
        # "d" (or "f"/"g") from the estimate alone — only with a measured
        # cap > 0.
        form = "d" if MEASURED_TD.get(("d",) + key, 0) else "a"
    td = best_td(form)
    if td == 0:  # measured: this formulation cannot lower — fall back
        other = "a" if form == "d" else "d"
        if other == "d" and not MEASURED_TD.get(("d",) + key, 0):
            other, td = "a", 0
        if other == "d":
            form = other
            td = max(best_td(form), 1)
        else:
            form = "a"
            td = max(best_td("a"), 1)
    if _td_override is not None:
        td = _td_override
    return form, td


def _pick_form_ht(kind: str, H: int, W: int, Ci: int, Co: int,
                  itemsize: int, fused: bool, TH: int) -> str:
    """Dot formulation for the H-tiled kernels: measured-faster form when
    calibrated AT THE LIVE TH (a verdict timed at a different tile height
    is stale — discarded so a _pick_th change forces recalibration), else
    "d" only when its (3·C_out, (TH+2)·W) f32 dot output clearly fits the
    per-tile budget."""
    from .vmem_table import CALIBRATED_TH, PREFERRED_FORM_HT

    if _form_override is not None:
        return _form_override
    key = (kind, H, W, Ci, Co, itemsize, bool(fused))
    form = PREFERRED_FORM_HT.get(key)
    if form is not None and CALIBRATED_TH.get(key, TH) == TH:
        return form
    return "d" if 3 * Co * (TH + 2) * W * 4 <= 4_000_000 else "a"


def _prep_w(w):
    """(3, 3, 3, Ci, Co) flax kernel → (3, 3, Co, 3·Ci) with kw folded into
    the contraction (patch row order = kw-major, ci-minor)."""
    w = jnp.transpose(w, (0, 1, 4, 2, 3))  # (kd, kh, co, kw, ci)
    kd, kh, co, kw, ci = w.shape
    return w.reshape(kd, kh, co, kw * ci)


def _prep_w_d(w):
    """(3, 3, 3, Ci, Co) flax kernel → (kd, 3·Co, 3·Ci) for formulation "d":
    M rows ordered (kh, co), K cols ordered (kw, ci) — the same memory
    layout as `_prep_w` with kh folded into M."""
    w = jnp.transpose(w, (0, 1, 4, 2, 3))  # (kd, kh, co, kw, ci)
    kd, kh, co, kw, ci = w.shape
    return w.reshape(kd, kh * co, kw * ci)


def _prep_w_e(w):
    """(3, 3, 3, Ci, Co) flax kernel → (kd, Co, 9·Ci) for formulation "e":
    K ordered (kh, kw, ci) to match `_patch9`."""
    w = jnp.transpose(w, (0, 4, 1, 2, 3))  # (kd, co, kh, kw, ci)
    kd, co = w.shape[:2]
    return w.reshape(kd, co, 9 * w.shape[-1])


def _prep_w_f(w):
    """(3, 3, 3, Ci, Co) flax kernel → (Co, 27·Ci) for formulation "f":
    every tap in the contraction, K ordered (kd, kh, kw, ci) to match
    `_patch27`."""
    w = jnp.transpose(w, (4, 0, 1, 2, 3))  # (co, kd, kh, kw, ci)
    co = w.shape[0]
    return w.reshape(co, 27 * w.shape[-1])


def _prep_w_g(w):
    """(3, 3, 3, Ci, Co) flax kernel → (kd, 9·Co, Ci) for formulation "g":
    M rows ordered (kh, kw, co), K = ci alone."""
    w = jnp.transpose(w, (0, 1, 2, 4, 3))  # (kd, kh, kw, co, ci)
    kd, kh, kw, co, ci = w.shape
    return w.reshape(kd, kh * kw * co, ci)


# form-"f" eligibility: the f32 (27·Ci, S) patch must stay a small slice of
# scoped VMEM (the form exists for the tiny-Ci stem class; at Ci=1/96² it is
# 1 MB). form "g" stacks 9·Co along M — only a win while Co is far below the
# 128-sublane tile. form "e" carries a (9·Ci, S) patch in the operand dtype;
# the budget admits the 48³/128³ pair convs (Ci=64, S≤4096: 2.65 MB) and the
# 96² Ci≤32 planes — whether the biggest admitted shapes actually lower is
# the calibrator's verdict, not the estimate's.
_F_PATCH_BUDGET = 4_000_000  # bytes of the f32 (27·Ci, S) patch
_E_PATCH_BUDGET = 6_000_000  # bytes of the (9·Ci, S) patch
_G_CO_MAX = 4


def _form_eligible(form: str, S: int, Ci: int, Co: int, fused: bool,
                   wgrad: bool, itemsize: int = 2) -> bool:
    if form == "e":
        return 9 * Ci * S * itemsize <= _E_PATCH_BUDGET
    if form == "f":
        return not fused and 27 * Ci * S * 4 <= _F_PATCH_BUDGET
    if form == "g":
        return not fused and not wgrad and Co <= _G_CO_MAX
    return True


# input-channel chunk ceiling: at C_in = 96 (the decoder's concat input) the
# per-program working set — three (C_in, H·W) halo rows, the (3·C_in, H·W)
# patch and the f32 accumulator — blows the ~16 MB VMEM budget (observed:
# "scoped allocation 20.05M ... exceeded scoped vmem limit" on v5e at 96³).
# Splitting the contraction into chunks summed in XLA keeps every call
# comfortably inside VMEM at identical math and negligible extra traffic.
# f32 operands double the per-channel footprint AND lose the bf16 halving on
# every intermediate row copy, so their ceiling drops to 16 (observed on v5e
# at 96² planes: 64-ch f32 = 18.56M scoped, 32-ch f32 concat = 26.12M — both
# over the 16M budget; the f32 path is correctness-only, training runs bf16).
_CI_CHUNK = 64


# kw-concat patches cost an extra (3·C_in, S) VMEM buffer; the byte budget
# below bounds a (C_in, S) input row so that concat mode always fits. The
# 27-dot per-tap mode still exists as a fallback but is deliberately made
# unreachable for supported shapes: its f32 row copies proved fragile
# against compiler scheduling (the SAME Ci=64/96² bf16 graph that lowered
# in round 2 now retains 25.81M scoped VMEM on a fresh compile) — chunking
# channels down to concat-capable sizes is shape-for-shape reliable.
_CONCAT_BUDGET = 900_000  # bytes of a (C_in, S) row


def _ci_chunk_for(dtype, S: int) -> int:
    cap = max(16, _CONCAT_BUDGET // (S * jnp.dtype(dtype).itemsize))
    return min(_CI_CHUNK, cap)


def _ci_cap(dtype, H: int, W: int) -> int:
    """Channel-chunk ceiling for an (H, W) plane: the H-tiled path's VMEM
    footprint is per-TILE, so it keeps the full ceiling; whole-plane kernels
    shrink it so every chunk is concat-capable."""
    S = H * W
    if not _whole_plane_ok(dtype, S) and _ht_supported(H, W):
        return _CI_CHUNK
    return _ci_chunk_for(dtype, S)


def _ci_chunks(Ci: int, cap: int):
    n = -(-Ci // cap)
    size = -(-Ci // n)
    return [(s, min(size, Ci - s)) for s in range(0, Ci, size)]


# whole-plane kernels hold entire (C, H·W) planes in VMEM — fine up to 96²
# in-plane voxels at bf16, OOM beyond (v5e); larger planes take the H-tiled
# path. The budget is in BYTES (96²·2), so f32 planes hand over at 48²·2.
_PLANE_LANES = 96 * 96


def _whole_plane_ok(dtype, S: int) -> bool:
    """True when a whole (C, S) plane fits the bf16-calibrated byte budget.
    Both the gate (cf_plane_supported) and the kernel dispatch MUST use this
    single predicate: an f32 plane with 4608 < S <= 9216 admitted by the
    H-tiled gate clause but dispatched whole-plane retains >16 MB scoped
    VMEM (Mosaic compile failure on real lowering)."""
    return S * jnp.dtype(dtype).itemsize <= _PLANE_LANES * 2


def _stats_spec(Ci, n_grid: int):
    """BlockSpec for the (B, 2, C, 1) fused-epilogue stats operand."""
    if n_grid == 2:
        return pl.BlockSpec((1, 2, Ci, 1), lambda b, d: (b, 0, 0, 0))
    return pl.BlockSpec((1, 2, Ci, 1), lambda b, d, h: (b, 0, 0, 0))


def _conv3_cf_pallas(x, w, interpret=False, stats=None):
    """Forward kernels on (B, D, C, H, W) operands — the kernels' native
    layout, so the (B, D, C, H·W) view is a free reshape (the old
    channel-second layout paid ~5 ms/step of transpose copies at 96³).
    `stats` (B, 2, C_in, 1) f32 enables the fused IN+relu epilogue
    (y = conv(relu(x·scale + shift)))."""
    B, D, Ci, H, W = x.shape
    Co = w.shape[-1]
    S = H * W
    cap = _ci_cap(x.dtype, H, W)
    if Ci > cap:
        out = None
        for s, n in _ci_chunks(Ci, cap):
            part = _conv3_cf_pallas(
                x[:, :, s : s + n], w[:, :, :, s : s + n], interpret,
                None if stats is None else stats[:, :, s : s + n],
            )
            # partial sums stay in x.dtype: f32 partials doubled the write
            # bandwidth of every chunked conv (113 MB/partial at 96³ full
            # res) and cost ~3% of the whole train step; the ~2-ulp bf16
            # re-rounding is noise at training precision
            out = part if out is None else out + part
        return out
    xf = x.reshape(B, D, Ci, S)
    fuse = stats is not None
    st = (stats.astype(jnp.float32),) if fuse else ()
    if not _whole_plane_ok(x.dtype, S) and _ht_supported(H, W):
        TH = _pick_th(H, W, max(Ci, Co))
        form = _pick_form_ht("fwd", H, W, Ci, Co, x.dtype.itemsize, fuse, TH)
        _emit_trace(op="conv_cf", kind="fwd", mode="ht", B=B, D=D, Ci=Ci,
                    Co=Co, H=H, W=W, itemsize=x.dtype.itemsize,
                    dtype=str(x.dtype), fused=fuse, th=TH, form=form)
        st_specs = [_stats_spec(Ci, 3)] if fuse else []
        if form == "d":
            kernel = functools.partial(_fwd_kernel_ht_d, W, Co, fuse)
            w_prep = _prep_w_d(w).astype(x.dtype)
            w_spec = pl.BlockSpec((3, 3 * Co, 3 * Ci),
                                  lambda b, d, h: (0, 0, 0))
        else:
            kernel = functools.partial(_fwd_kernel_ht, W, fuse)
            w_prep = _prep_w(w).astype(x.dtype)
            w_spec = pl.BlockSpec((3, 3, Co, 3 * Ci),
                                  lambda b, d, h: (0, 0, 0, 0))
        out = pl.pallas_call(
            kernel,
            grid=(B, D, H // TH),
            in_specs=_halo_specs_ht(Ci, D, H, W, TH) + st_specs + [w_spec],
            out_specs=pl.BlockSpec((1, 1, Co, TH * W),
                                   lambda b, d, h: (b, d, 0, h)),
            out_shape=jax.ShapeDtypeStruct((B, D, Co, S), x.dtype),
            interpret=interpret,
        )(*([xf] * 9), *st, w_prep)
        return out.reshape(B, D, Co, H, W)
    concat_kw = S * Ci * x.dtype.itemsize <= _CONCAT_BUDGET
    if concat_kw:
        form, TD = _resolve_plane(D, S, Ci, Co, x.dtype.itemsize, False, fuse)
    else:
        form, TD = "a", 1
    _emit_trace(op="conv_cf", kind="fwd", mode="plane", B=B, D=D, Ci=Ci,
                Co=Co, H=H, W=W, itemsize=x.dtype.itemsize,
                dtype=str(x.dtype), fused=fuse, concat_kw=concat_kw, td=TD,
                form=form)
    st_specs = [_stats_spec(Ci, 2)] if fuse else []
    if form == "d":
        kernel = functools.partial(_fwd_kernel_d, W, Co, TD, fuse)
        w_prep = _prep_w_d(w).astype(x.dtype)
        w_spec = pl.BlockSpec((3, 3 * Co, 3 * Ci), lambda b, d: (0, 0, 0))
    elif form == "e":
        kernel = functools.partial(_fwd_kernel_e, W, TD, fuse)
        w_prep = _prep_w_e(w).astype(x.dtype)
        w_spec = pl.BlockSpec((3, Co, 9 * Ci), lambda b, d: (0, 0, 0))
    elif form == "f":
        kernel = functools.partial(_fwd_kernel_f, W, TD)
        w_prep = _prep_w_f(w).astype(x.dtype)
        w_spec = pl.BlockSpec((Co, 27 * Ci), lambda b, d: (0, 0))
    elif form == "g":
        kernel = functools.partial(_fwd_kernel_g, W, Co, TD)
        w_prep = _prep_w_g(w).astype(x.dtype)
        w_spec = pl.BlockSpec((3, 9 * Co, Ci), lambda b, d: (0, 0, 0))
    else:
        kernel = functools.partial(_fwd_kernel, W, concat_kw, TD, fuse)
        w_prep = _prep_w(w).astype(x.dtype)
        w_spec = pl.BlockSpec((3, 3, Co, 3 * Ci), lambda b, d: (0, 0, 0, 0))
    out = pl.pallas_call(
        kernel,
        grid=(B, D // TD),
        in_specs=_halo_specs(Ci, D, S, TD) + st_specs + [w_spec],
        out_specs=pl.BlockSpec((1, TD, Co, S), lambda b, d: (b, d, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, D, Co, S), x.dtype),
        interpret=interpret,
    )(xf, xf, xf, *st, w_prep)
    return out.reshape(B, D, Co, H, W)


def _wgrad_pallas(x, dy, Co, interpret=False, stats=None):
    B, D, Ci, H, W = x.shape
    S = H * W
    cap = _ci_cap(x.dtype, H, W)
    if Ci > cap:
        return jnp.concatenate(
            [_wgrad_pallas(x[:, :, s : s + n], dy, Co, interpret,
                           None if stats is None else stats[:, :, s : s + n])
             for s, n in _ci_chunks(Ci, cap)],
            axis=3,
        )
    xf = x.reshape(B, D, Ci, S)
    dyf = dy.reshape(B, D, Co, S)
    fuse = stats is not None
    st = (stats.astype(jnp.float32),) if fuse else ()
    if not _whole_plane_ok(x.dtype, S) and _ht_supported(H, W):
        TH = _pick_th(H, W, max(Ci, Co))
        form = _pick_form_ht("wgrad", H, W, Ci, Co, x.dtype.itemsize, fuse,
                             TH)
        _emit_trace(op="conv_cf", kind="wgrad", mode="ht", B=B, D=D, Ci=Ci,
                    Co=Co, H=H, W=W, itemsize=x.dtype.itemsize,
                    dtype=str(x.dtype), fused=fuse, th=TH, form=form)
        st_specs = [_stats_spec(Ci, 3)] if fuse else []
        if form == "d":
            body_specs = _halo_specs_ht(Ci, D, H, W, TH)[:3]
            dw = pl.pallas_call(
                functools.partial(_wgrad_kernel_ht_d, W, Co, fuse),
                grid=(B, D, H // TH),
                in_specs=body_specs + st_specs
                + _dy_specs_ht(Co, D, H, W, TH),
                out_specs=pl.BlockSpec((3, 3 * Co, 3 * Ci),
                                       lambda b, d, h: (0, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((3, 3 * Co, 3 * Ci),
                                               jnp.float32),
                interpret=interpret,
            )(xf, xf, xf, *st, dyf, dyf, dyf)
        else:
            dw = pl.pallas_call(
                functools.partial(_wgrad_kernel_ht, W, fuse),
                grid=(B, D, H // TH),
                in_specs=_halo_specs_ht(Ci, D, H, W, TH) + st_specs
                + [pl.BlockSpec((1, 1, Co, TH * W),
                                lambda b, d, h: (b, d, 0, h))],
                out_specs=pl.BlockSpec((3, 3, Co, 3 * Ci),
                                       lambda b, d, h: (0, 0, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((3, 3, Co, 3 * Ci),
                                               jnp.float32),
                interpret=interpret,
            )(*([xf] * 9), *st, dyf)
        dw = dw.reshape(3, 3, Co, 3, Ci)
        return jnp.transpose(dw, (0, 1, 3, 4, 2))
    concat_kw = S * Ci * x.dtype.itemsize <= _CONCAT_BUDGET
    if concat_kw:
        form, TD = _resolve_plane(D, S, Ci, Co, x.dtype.itemsize, True, fuse)
    else:
        form, TD = "a", 1
    _emit_trace(op="conv_cf", kind="wgrad", mode="plane", B=B, D=D, Ci=Ci,
                Co=Co, H=H, W=W, itemsize=x.dtype.itemsize,
                dtype=str(x.dtype), fused=fuse, concat_kw=concat_kw, td=TD,
                form=form)
    st_specs = [_stats_spec(Ci, 2)] if fuse else []
    if form == "d":
        kernel = functools.partial(_wgrad_kernel_d, W, Co, TD, fuse)
        out_spec = pl.BlockSpec((3, 3 * Co, 3 * Ci), lambda b, d: (0, 0, 0))
        out_shape = jax.ShapeDtypeStruct((3, 3 * Co, 3 * Ci), jnp.float32)
    elif form == "e":
        kernel = functools.partial(_wgrad_kernel_e, W, TD, fuse)
        out_spec = pl.BlockSpec((3, Co, 9 * Ci), lambda b, d: (0, 0, 0))
        out_shape = jax.ShapeDtypeStruct((3, Co, 9 * Ci), jnp.float32)
    elif form == "f":
        kernel = functools.partial(_wgrad_kernel_f, W, TD)
        out_spec = pl.BlockSpec((Co, 27 * Ci), lambda b, d: (0, 0))
        out_shape = jax.ShapeDtypeStruct((Co, 27 * Ci), jnp.float32)
    else:
        kernel = functools.partial(_wgrad_kernel, W, concat_kw, TD, fuse)
        out_spec = pl.BlockSpec((3, 3, Co, 3 * Ci),
                                lambda b, d: (0, 0, 0, 0))
        out_shape = jax.ShapeDtypeStruct((3, 3, Co, 3 * Ci), jnp.float32)
    dw = pl.pallas_call(
        kernel,
        grid=(B, D // TD),
        in_specs=_halo_specs(Ci, D, S, TD) + st_specs
        + [pl.BlockSpec((1, TD, Co, S), lambda b, d: (b, d, 0, 0))],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(xf, xf, xf, *st, dyf)
    if form == "e":
        # (kd, co, kh·kw·ci) → flax layout (kd, kh, kw, ci, co)
        dw = dw.reshape(3, Co, 3, 3, Ci)
        return jnp.transpose(dw, (0, 2, 3, 4, 1))
    if form == "f":
        # (co, kd·kh·kw·ci) → flax layout (kd, kh, kw, ci, co)
        dw = dw.reshape(Co, 3, 3, 3, Ci)
        return jnp.transpose(dw, (1, 2, 3, 4, 0))
    # (kd, kh, co, kw*ci) → flax layout (kd, kh, kw, ci, co)
    dw = dw.reshape(3, 3, Co, 3, Ci)
    return jnp.transpose(dw, (0, 1, 3, 4, 2))


def _flip_w(w):
    """Weights of the transposed conv: flip taps, swap in/out channels."""
    return jnp.transpose(w[::-1, ::-1, ::-1], (0, 1, 2, 4, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv3_cf(x, w, interpret=False):
    return _conv3_cf_pallas(x, w, interpret)


def _conv3_cf_fwd(x, w, interpret):
    return _conv3_cf_pallas(x, w, interpret), (x, w)


def _conv3_cf_bwd(interpret, res, dy):
    x, w = res
    dx = _conv3_cf_pallas(dy, _flip_w(w).astype(dy.dtype), interpret)
    dw = _wgrad_pallas(x, dy, w.shape[-1], interpret)
    return dx, dw.astype(w.dtype)


_conv3_cf.defvjp(_conv3_cf_fwd, _conv3_cf_bwd)


def _conv3_cf_xla(x, w):
    """Reference semantics on non-TPU backends: (B, D, C, H, W) conv,
    SAME padding (feature dim in position 2). Operands are cast to f32 for
    the conv (f32 accumulation, matching the Pallas kernels) — ALSO required
    for differentiability: a bf16 conv with preferred_element_type=f32
    transposes into a mixed-dtype conv (f32 cotangent × bf16 operand) that
    lax rejects, which bf16 training on any pallas-off path (CPU, spatial
    sharding) would hit."""
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        w.astype(jnp.float32),
        window_strides=(1, 1, 1),
        padding="SAME",
        dimension_numbers=("NDCHW", "DHWIO", "NDCHW"),
    )
    return out.astype(x.dtype)


def cf_plane_supported(H: int, W: int, itemsize: int = 2) -> bool:
    """True when the Pallas CF kernels handle an (H, W) in-plane shape:
    whole-plane mode while a (C, H·W) plane stays inside the bf16-calibrated
    byte budget (f32 planes hit scoped-VMEM OOM at 96² — observed 16.45M at
    the decoder shapes even with 16-channel chunks), H-tiled mode for any
    128-divisible W (tile working sets are itemsize-insensitive). The first
    clause is _whole_plane_ok spelled on itemsize; the kernel dispatch uses
    the same byte budget, so every admitted shape takes a path that fits."""
    return H * W * itemsize <= _PLANE_LANES * 2 or _ht_supported(H, W)


def conv3x3x3_cf(x, w, force_pallas: bool = False, interpret: bool = False):
    """SAME 3³ conv on channel-first operands.

    x: (B, D, C_in, H, W) — depth-major channel-first, the kernels' native
    layout (views to (B, D, C, H·W) are free; a channel-second layout paid
    transpose copies per conv). w: (3, 3, 3, C_in, C_out) — the flax
    ``nn.Conv`` kernel layout, so parameters are interchangeable with the
    channels-last path. Differentiable (custom VJP on the Pallas path).
    """
    H, W = x.shape[3], x.shape[4]
    ok = cf_plane_supported(H, W, x.dtype.itemsize)
    if (force_pallas or dispatch.pallas_enabled()) and ok:
        return _conv3_cf(x, w.astype(x.dtype), interpret)
    return _conv3_cf_xla(x, w.astype(x.dtype))


# ------------------------------------------------------- fused IN+relu+conv
def _in_stats_cf(x, eps: float):
    """Instance-norm stats of (B, D, C, H, W) x, packed for the fused
    kernels: (B, 2, C, 1) f32 with [:, 0] = 1/σ and [:, 1] = −μ/σ, so the
    in-kernel epilogue is one multiply-add per element. One fused XLA
    reduction sweep."""
    n = x.shape[1] * x.shape[3] * x.shape[4]
    # dtype= fuses the f32 accumulation into the reduces — no materialized
    # f32 image of x (see layers.instance_norm_axes)
    s1 = jnp.sum(x, axis=(1, 3, 4), dtype=jnp.float32)
    s2 = jnp.sum(x * x, axis=(1, 3, 4), dtype=jnp.float32)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    return jnp.stack([inv, -mean * inv], axis=1)[..., None]  # (B, 2, C, 1)


def _in_relu_conv_bwd_xla(x, stats, da):
    """relu + instance-norm backward in XLA (closed form):
    dx = inv · (g − E[g] − x̂·E[g·x̂]) with g = da ⊙ 1[x̂ > 0].
    DC layout: spatial axes (1, 3, 4), channels at axis 2."""
    scale = stats[:, 0, :, 0][:, None, :, None, None]
    shift = stats[:, 1, :, 0][:, None, :, None, None]
    x32 = x.astype(jnp.float32)
    xh = x32 * scale + shift
    g = da.astype(jnp.float32) * (xh > 0)
    m1 = jnp.mean(g, axis=(1, 3, 4), keepdims=True)
    m2 = jnp.mean(g * xh, axis=(1, 3, 4), keepdims=True)
    return (scale * (g - m1 - xh * m2)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _in_relu_conv(x, w, eps: float, interpret: bool):
    stats = _in_stats_cf(x, eps)
    return _conv3_cf_pallas(x, w, interpret, stats)


def _in_relu_conv_fwd(x, w, eps, interpret):
    stats = _in_stats_cf(x, eps)
    return _conv3_cf_pallas(x, w, interpret, stats), (x, w, stats)


def _in_relu_conv_bwd(eps, interpret, res, dy):
    x, w, stats = res
    da = _conv3_cf_pallas(dy, _flip_w(w).astype(dy.dtype), interpret)
    dw = _wgrad_pallas(x, dy, w.shape[-1], interpret, stats)
    dx = _in_relu_conv_bwd_xla(x, stats, da)
    return dx, dw.astype(w.dtype)


_in_relu_conv.defvjp(_in_relu_conv_fwd, _in_relu_conv_bwd)


def _in_relu_conv_xla(x, w, eps: float):
    """Reference semantics for non-TPU backends: IN → relu → SAME conv,
    channel-first."""
    stats = _in_stats_cf(x, eps)
    scale = stats[:, 0, :, 0][:, None, :, None, None]
    shift = stats[:, 1, :, 0][:, None, :, None, None]
    a = jnp.maximum(x.astype(jnp.float32) * scale + shift, 0.0).astype(x.dtype)
    return _conv3_cf_xla(a, w.astype(x.dtype))


def in_relu_conv3x3x3_cf(x, w, eps: float = 1e-4, force_pallas: bool = False,
                         interpret: bool = False):
    """Fused pre-activation block: ``conv3x3x3_cf(relu(instance_norm(x)), w)``
    in one kernel pass over x (plus one XLA stats reduction) — the normalized
    activation tensor is never written to HBM, forward or backward
    (docs/perf.md lever 1: the remaining full-res elementwise passes were
    pure bandwidth). Matches ``ConvNormActCF`` preact semantics (IN eps 1e-4,
    no affine, relu; reference ``conv_layers.py:16-54``)."""
    H, W = x.shape[3], x.shape[4]
    ok = cf_plane_supported(H, W, x.dtype.itemsize)
    if (force_pallas or dispatch.pallas_enabled()) and ok:
        return _in_relu_conv(x, w.astype(x.dtype), eps, interpret)
    return _in_relu_conv_xla(x, w, eps)
