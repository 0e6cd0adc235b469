"""Channel-last Pallas depthwise 3x3x3 conv for the MedFormer MBConv /
patch-merging stages.

Why: XLA lowers ``feature_group_count=C`` conv3d on TPU into convolution
fusions that run far off the bandwidth bound — profiled at 13.6 ms/step of
the 96^3 train step (artifacts/profile_r3b: the [3,3,3,1,C] weight family —
fwd ~0.85 ms and wgrad ~3.1 ms for a single 48^3/256ch site whose tensors
are 113 MB; the op is purely bandwidth-bound and should cost ~0.5 ms).
Reference behaviour matched: ``rsuper_train/model/dim3/conv_layers.py:129``
(DepthwiseSeparableConv) and ``:197`` (MBConv depthwise stage).

Design notes (this is the SECOND design; the first — 9 halo refs tiling H —
lowered fine but re-read every tensor ~9x and measured SLOWER than XLA,
16.5 ms/step. Bandwidth discipline is the whole game for an elementwise op):
* Depthwise conv has NO channel contraction, so there is nothing for the
  MXU — it is 27 shifted elementwise FMAs. The natural layout is channel-
  LAST (B, D, H, W, C) with C on the lanes: every depthwise site in
  MedFormer has C in {256, 512, 1024}, all 128-divisible, so lanes are
  fully packed (the dense convs needed the channel-first trick exactly
  because their C=32 padded 4x; not the case here).
* Grid (NC, B, D): one whole (H, W, CB) plane per step, CB = 128 lanes.
  Depth taps are three refs of the same array with clamped index maps
  (d-1, d, d+1) — total traffic 3 reads + 1 write of the tensor (XLA's
  lowering does much worse; the ideal is 2). C is OUTERMOST so the fused
  backward's dw accumulator block is revisited consecutively.
* In-plane taps are jnp.roll along H (outer dim) / W (sublanes) — Mosaic
  lowers these to slice+concat. Edge rows/cols are zeroed by MULTIPLYING
  with (H,1,1)/(1,W,1) f32 mask vectors: the first design's full-size
  broadcasted_iota + where masks materialised (H,W,C)-sized int32 temps and
  blew the 16 MB scoped-VMEM stack (22.2M at (48,48,256)).
* Stack discipline (the 16 MB default scoped-VMEM stack OOM'd the fused
  backward at the real 48^3/256 site — 17.14M measured): only ONE depth
  plane is cast to f32 at a time, the H-roll is hoisted out of the W-tap
  loop (3 H-rolls instead of 9 per plane), and the pallas_call raises
  ``vmem_limit_bytes`` — the whole-plane live set (acc + current plane +
  two roll temps + x for the backward) is worth ~6-10 f32 planes, which the
  dw_supported gate budgets explicitly.
* The backward pass is ONE kernel producing both grads: with
  s_t = shift(dy, -t),  dx += w[t]*s_t  and  dw[t] += sum(s_t * x) share
  the shifted plane, so dx+dw costs 5 tensor passes instead of 8.
* Accumulation in f32, output cast to the input dtype.

Pallas kernels have no autodiff: the op carries a custom VJP. stop_gradient
is NOT needed by callers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import dispatch

_CB = 128  # channel chunk = one full lane register width

# Mosaic stack budget: the fused backward's live set measures ~15x the f32
# plane size at 48^2 (Mosaic's allocator does not fully reuse across the
# unrolled 27-tap DAG), so budget 16 planes and raise the kernel VMEM limit
# to cover stack + double-buffered block refs. Production sites are <=64^2
# in-plane (64^3/256 at 128^3 training: 16 x 2.1 MB = 34 MB stack, ~13 MB
# refs — comfortably inside the 100 MB limit of v5e's 128 MB VMEM).
_VMEM_LIMIT_BYTES = 100 * 1024 * 1024
_STACK_PLANES = 16
_STACK_BUDGET = 64 * 1024 * 1024


def _plane_f32(H, W, CB):
    return H * W * CB * 4


def dw_supported(shape, dtype) -> bool:
    """Gate: (B, D, H, W, C) with 128-divisible C (full lanes) and the
    whole-plane stack working set inside the raised VMEM budget. Oversized
    planes (>= ~112^2 in-plane) fall back to XLA — no production site does.

    The stack term is dtype-independent (the kernel computes on f32 planes);
    `dtype` sizes the double-buffered block refs (~6 planes: x, dy in, dx out
    ×2 buffers), which must fit beside the stack under the raised VMEM limit.
    """
    if len(shape) != 5:
        return False
    _, _, H, W, C = shape
    if C % _CB:
        return False
    cb = min(C, _CB)
    stack = _STACK_PLANES * _plane_f32(H, W, cb)
    refs = 6 * H * W * cb * jnp.dtype(dtype).itemsize
    return stack <= _STACK_BUDGET and stack + refs <= _VMEM_LIMIT_BYTES


def _edge_iotas(H, W):
    """(H,1,1) / (1,W,1) index vectors for border-zero masks."""
    ih = jax.lax.broadcasted_iota(jnp.int32, (H, 1, 1), 0)
    iw = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)
    return ih, iw


def _shift_h(x, dy, ih):
    """z[h] = x[h+dy], zero outside the plane. x: (H, W, CB) f32."""
    if not dy:
        return x
    H = x.shape[0]
    x = jnp.roll(x, -dy, axis=0)
    mh = (ih >= max(0, -dy)) & (ih < H - max(0, dy))
    return x * mh.astype(jnp.float32)


def _shift_w(x, dx, iw):
    """z[w] = x[w+dx], zero outside the plane."""
    if not dx:
        return x
    W = x.shape[1]
    x = jnp.roll(x, -dx, axis=1)
    mw = (iw >= max(0, -dx)) & (iw < W - max(0, dx))
    return x * mw.astype(jnp.float32)


def _depth_mask(x, kind, d, D):
    """Zero the plane when its clamped depth load fell off the volume."""
    if kind == "lo":
        return x * (d > 0).astype(jnp.float32)
    if kind == "hi":
        return x * (d < D - 1).astype(jnp.float32)
    return x


def _fwd_kernel(D, xm_ref, x0_ref, xp_ref, w_ref, o_ref):
    H, W = o_ref.shape[2], o_ref.shape[3]
    ih, iw = _edge_iotas(H, W)
    d = pl.program_id(2)
    acc = jnp.zeros(o_ref.shape[2:], jnp.float32)
    # one depth plane live at a time; H-roll shared across the 3 W-taps
    for iz, (ref, kind) in enumerate(
            ((xm_ref, "lo"), (x0_ref, None), (xp_ref, "hi"))):
        x = _depth_mask(ref[0, 0].astype(jnp.float32), kind, d, D)
        for dy in (-1, 0, 1):
            xy = _shift_h(x, dy, ih)
            for dx in (-1, 0, 1):
                tap = (iz * 3 + (dy + 1)) * 3 + (dx + 1)
                acc += _shift_w(xy, dx, iw) * w_ref[tap]
    o_ref[0, 0] = acc.astype(o_ref.dtype)


def _bwd_kernel(D, gm_ref, g0_ref, gp_ref, x_ref, w_ref, dx_ref, dw_ref):
    """Fused backward: dx[q] = sum_k w[k]*dy[q-(k-1)]; dw[k] = sum_q
    dy[q-(k-1)]*x[q] — both consume the same shifted-dy plane, one pass
    over the tensors. Kernel depth-index k=0 needs dy[d+1] (masked at the
    volume end), k=2 needs dy[d-1] — each ref's edge mask matches its
    clamped index map."""
    b, d = pl.program_id(1), pl.program_id(2)

    @pl.when(jnp.logical_and(b == 0, d == 0))
    def _():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    H, W = dx_ref.shape[2], dx_ref.shape[3]
    ih, iw = _edge_iotas(H, W)
    x = x_ref[0, 0].astype(jnp.float32)
    acc = jnp.zeros(dx_ref.shape[2:], jnp.float32)
    for k, (ref, kind) in enumerate(
            ((gp_ref, "hi"), (g0_ref, None), (gm_ref, "lo"))):
        g = _depth_mask(ref[0, 0].astype(jnp.float32), kind, d, D)
        for dy in (-1, 0, 1):
            gy = _shift_h(g, -dy, ih)
            for dx in (-1, 0, 1):
                tap = (k * 3 + (dy + 1)) * 3 + (dx + 1)
                s = _shift_w(gy, -dx, iw)
                acc += s * w_ref[tap]
                dw_ref[tap] += jnp.sum(s * x, axis=(0, 1))
    dx_ref[0, 0] = acc.astype(dx_ref.dtype)


def _depth_specs(D, H, W, CB):
    blk = (1, 1, H, W, CB)

    def lo(c, b, d):
        return (b, jnp.maximum(d - 1, 0), 0, 0, c)

    def mid(c, b, d):
        return (b, d, 0, 0, c)

    def hi(c, b, d):
        return (b, jnp.minimum(d + 1, D - 1), 0, 0, c)

    return [pl.BlockSpec(blk, lo), pl.BlockSpec(blk, mid),
            pl.BlockSpec(blk, hi)], blk, mid


def _params(interpret):
    if interpret:
        return {}
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_LIMIT_BYTES)}


def _emit_trace(**sig):
    hook = getattr(dispatch, "_dw_trace_hook", None)
    if hook is not None:
        hook(dict(sig))


def _dw_pallas(x, w27, interpret=False):
    B, D, H, W, C = x.shape
    CB = min(C, _CB)
    _emit_trace(op="dwconv", kind="fwd", B=B, D=D, H=H, W=W, C=C,
                dtype=str(x.dtype))
    halo, blk, mid = _depth_specs(D, H, W, CB)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, D),
        grid=(C // CB, B, D),
        in_specs=halo + [pl.BlockSpec((27, CB), lambda c, b, d: (0, c))],
        out_specs=pl.BlockSpec(blk, mid),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
        **_params(interpret),
    )(x, x, x, w27)


def _dw_bwd_pallas(x, w27, g, interpret=False):
    B, D, H, W, C = x.shape
    CB = min(C, _CB)
    _emit_trace(op="dwconv", kind="bwd", B=B, D=D, H=H, W=W, C=C,
                dtype=str(x.dtype))
    halo, blk, mid = _depth_specs(D, H, W, CB)
    dx, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, D),
        grid=(C // CB, B, D),
        in_specs=halo + [pl.BlockSpec(blk, mid),
                         pl.BlockSpec((27, CB), lambda c, b, d: (0, c))],
        out_specs=[pl.BlockSpec(blk, mid),
                   pl.BlockSpec((27, CB), lambda c, b, d: (0, c))],
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct((27, C), jnp.float32)],
        interpret=interpret,
        **_params(interpret),
    )(g, g, g, x, w27)
    return dx, dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dw_conv(x, w27, interpret=False):
    return _dw_pallas(x, w27, interpret)


def _dw_fwd(x, w27, interpret):
    return _dw_pallas(x, w27, interpret), (x, w27)


def _dw_vjp(interpret, res, g):
    x, w27 = res
    dx, dw = _dw_bwd_pallas(x, w27, g, interpret)
    return dx, dw.astype(w27.dtype)


_dw_conv.defvjp(_dw_fwd, _dw_vjp)


def _dw_xla(x, w):
    """Reference semantics: SAME depthwise conv3d, NDHWC/DHWIO, C groups.
    Mirrors flax ``nn.Conv(dtype=...)`` exactly (kernel cast to the compute
    dtype, no preferred_element_type) so swapping the module in changes
    nothing numerically on the fallback path."""
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=x.shape[-1],
    )


def depthwise_conv3x3x3(x, w, force_pallas: bool = False,
                        interpret: bool = False):
    """SAME 3^3 depthwise conv on (B, D, H, W, C) operands.

    ``w`` is the flax depthwise kernel, shape (3, 3, 3, 1, C). Pallas on TPU
    when the gate passes, XLA everywhere else (identical semantics, tested).
    """
    assert w.shape[:4] == (3, 3, 3, 1) and w.shape[4] == x.shape[-1]
    use = (force_pallas or dispatch.pallas_enabled()) and \
        dw_supported(x.shape, x.dtype)
    if not use:
        return _dw_xla(x, w)
    w27 = w.reshape(27, w.shape[4]).astype(jnp.float32)
    return _dw_conv(x, w27, interpret)
