"""The R-Super Ball Loss, static-shape TPU edition.

Reference: ``rsuper_train/training/losses_foundation.py:1537-1864``
(``ball_loss``) and ``:1387-1532`` (``isolate_tumor``).

The reference's algorithm, per batch item and per reported tumor (largest
first):
  1. convolve the sigmoid output (restricted to the reported organ
     sub-segment) with a Gaussian-filled ball the size of the reported
     diameter; the argmax locates the best-fitting ball centre;
  2. paste a binary ball of diameter·(1+margin) there (grown if clipped by the
     crop border until it can hold the reported volume);
  3. keep the top-N voxels by confidence inside that ball (N = reported
     volume, with small/big variants at ∓/± the volume margin) as a binary
     pseudo-mask, then erase the found tumor and repeat for the next one;
  4. supervise with BCE toward the union pseudo-mask — foreground voxels
     weighted by hard-cutoff GWRP, background averaged separately — with a
     border ring (big mask dilated by 7, minus the small mask) excluded; plus
     an optional adaptive-Tversky Dice term. Items with no reported tumor get
     BCE toward zero over the penalisable region.

TPU-first redesign (every shape static, no data-dependent python control flow):
* the whole batch is processed together — tumor slot t of EVERY item runs in
  one batched step (shared/batched FFTs, one Pallas selection kernel per
  slot), and the executed slot count is the batch MAX tumor count, not the
  sum: a ``lax.while_loop`` over the live (volume-sorted, hence prefix)
  slots — dead slots are never dispatched (round-1 ran items serially
  under ``lax.map``, a 2× wall at the reference's per-chip batch 2);
* an all-mask-only batch skips the entire construction via an outer
  ``lax.cond``, and items without tumors get the cheap no-tumor BCE;
* the ball convolution runs in the FFT domain (`ops.balls.fft_ball_conv`) —
  cost independent of the reported diameter;
* dynamic top-k becomes threshold-selection by bisection (`ops.selection`),
  the three volume variants (N, N_small, N_big) share one vmapped bisection;
* the "grow the ball while it is clipped by the border" while-loop becomes a
  bounded ``lax.while_loop`` on scalar state;
* GWRP foreground weights use threshold-count ranking (`ops.gwrp`).

The pseudo-masks are pure supervision targets: the whole construction is
wrapped in ``stop_gradient`` (the reference never backprops through topk
indices either — gradients flow only through the BCE/Dice on the raw logits).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.balls import (ball_count_clipped, ball_count_wrapped,
                         fft_ball_conv, insert_ball)
from ..ops.gwrp import gwrp_weights_binned
from ..ops.morphology import dilate_cf
from ..ops.selection import topn_masks_multi_batched
from .lesions import LesionChannelMap
from .seg import bce_with_logits

_SPATIAL3 = (0, 1, 2)


def _tversky_cf(preds, targets, known, class_weights=None, smooth: float = 1e-5):
    """Adaptive-Tversky Dice on channel-FIRST (C, D, H, W) single-item masks
    (same math as ``seg.adaptive_tversky_dice``; spatial-minor layout keeps
    tiny lesion channel counts out of the TPU lane dim)."""
    p = jax.nn.sigmoid(preds.astype(jnp.float32)) * known
    t = targets.astype(jnp.float32) * known
    tp, fp, fn = p * t, p * (1.0 - t), (1.0 - p) * t
    fp_c = jnp.sum(fp, axis=(-3, -2, -1))
    fn_c = jnp.sum(fn, axis=(-3, -2, -1))
    alpha = jnp.clip(fp_c / (fp_c + fn_c + smooth), 0.2, 0.8)
    num = jnp.sum(tp, axis=(-3, -2, -1))
    den = num + alpha * fp_c + (1.0 - alpha) * jnp.sum(fn, axis=(-3, -2, -1))
    loss = 1.0 - num / (den + smooth)  # (C,)
    if class_weights is not None:
        loss = loss * class_weights
    return jnp.mean(loss)


class BallLossConfig(NamedTuple):
    """Static hyper-parameters (reference defaults, ``losses_foundation.py:1537-1542``
    and the CLI default ``--ball_volume_margin 0.2`` at ``train_ddp.py:464``)."""

    diameter_margin: float = 0.2
    volume_margin: float = 0.2
    gaussian: bool = True
    gaussian_std: float = 1.5
    gwrp: bool = True
    gwrp_concentration: float = 0.5
    dilation_for_background: int = 7
    subseg_dilation: int = 31
    unk_dilation: int = 1
    standard_ce: bool = False
    use_small_pseudo_mask: bool = True
    apply_dice_loss: bool = False
    max_diameter: int = 96  # static bound on reported diameters (voxels)
    grow_iters: int = 12  # bound for the border-growth loop
    topn_iters: int = 26  # bisection depth for top-N selection
    gwrp_levels: int = 256  # rank resolution for GWRP weights


def _ball_voxel_count(shape, diameter):
    """Number of voxels in the discrete ball of (traced) `diameter` — the
    reference's ``(kernel > 0).sum()`` (``losses_foundation.py:1431``).
    Closed-form O(D·H) count (`ops.balls.ball_count_wrapped`), no grid."""
    return ball_count_wrapped(shape, diameter)


def isolate_tumor_batched(x, diameter, volume, cfg: BallLossConfig):
    """Locate one tumor PER ITEM and build (normal, small, big) pseudo-masks.

    Batched static-shape equivalent of the reference's ``isolate_tumor``
    (``losses_foundation.py:1387-1532``): the FFT localisation runs as one
    batched transform and all items share one Pallas selection kernel.
    `x`: (B, D, H, W) non-negative (sigmoid output × organ segment);
    `diameter`, `volume`: (B,) traced. The growth/fallback loops run until
    every item converges, with converged items frozen (identical per-item
    results to the serial form).
    Returns (mask, mask_small, mask_big), each (B, D, H, W) float32 in {0,1}.
    """
    B = x.shape[0]
    shape = x.shape[1:]
    V = int(math.prod(shape))
    # clamp to the static FFT-padding bound (wrap-around safety); tumors larger
    # than the crop are border-handled by the insertion-ball growth loop anyway
    diameter = jnp.minimum(jnp.asarray(diameter, jnp.float32),
                           float(cfg.max_diameter))
    volume = jnp.round(jnp.asarray(volume, jnp.float32))

    # Reference quirk kept for parity (losses_foundation.py:1431-1433): the
    # selected volume is raised to (ball voxel count - 1) whenever the
    # conv-ball holds more voxels than the reported volume, so the pseudo-mask
    # is never much smaller than the ball of the reported diameter.
    ballcount = jax.vmap(lambda d: _ball_voxel_count(shape, d))(diameter)
    volume = jnp.where(ballcount > volume, ballcount - 1.0, volume)

    # -- 1. ball convolution + argmax -> best centre --------------------------
    conv = jax.vmap(
        lambda xi, d: fft_ball_conv(
            xi, d, gaussian=cfg.gaussian, gaussian_std=cfg.gaussian_std,
            max_diameter=cfg.max_diameter,
        )
    )(x, diameter)
    flat_idx = jnp.argmax(conv.reshape(B, -1), axis=-1)
    cz = flat_idx // (shape[1] * shape[2])
    cy = (flat_idx // shape[2]) % shape[1]
    cx = flat_idx % shape[2]

    def balls_of(d):  # (B,) diameters -> (B, D, H, W) insertion balls
        return jax.vmap(
            lambda c0, c1, c2, dd: insert_ball(
                shape, (c0, c1, c2), dd * (1.0 + cfg.diameter_margin))
        )(cz, cy, cx, d)

    # -- 2. insertion ball, grown while clipped by the border -----------------
    # The reference grows d by 10% per iteration until the (border-clipped)
    # insertion ball holds the reported volume (losses_foundation.py:1450-1461).
    # The growth ladder d_{k+1} = max(round(1.1·d_k), d_k+1) is a fixed
    # per-item sequence, so instead of a sequential while_loop that
    # materialises B full (D,H,W) balls per trip-count check, evaluate ALL
    # grow_iters+1 candidates at once with the closed-form clipped-voxel count
    # (O(D·H) each) and pick the first satisfying rung — identical result
    # (per-item growth is independent: the loop froze converged items).
    cands = [diameter]
    for _ in range(cfg.grow_iters):
        d_prev = cands[-1]
        cands.append(jnp.maximum(jnp.round(d_prev * 1.1), d_prev + 1.0))
    cands = jnp.stack(cands, axis=-1)  # (B, grow_iters+1)

    counts = jax.vmap(  # clipped-ball voxel count per item per rung
        jax.vmap(
            lambda c0, c1, c2, dd: ball_count_clipped(
                shape, (c0, c1, c2), dd * (1.0 + cfg.diameter_margin)),
            in_axes=(None, None, None, 0)),
    )(cz, cy, cx, cands)  # (B, grow_iters+1)
    satisfied = (counts >= volume[:, None]) | (
        cands >= jnp.float32(max(shape)))
    first = jnp.argmax(satisfied, axis=-1)  # first satisfying rung (0 if none)
    idx = jnp.where(jnp.any(satisfied, axis=-1), first, cfg.grow_iters)
    d_ins = jnp.take_along_axis(cands, idx[:, None], axis=-1)[:, 0]
    ball = balls_of(d_ins)

    # -- 3. top-N selection inside the ball -----------------------------------
    masked_x = x * ball
    t = jnp.minimum(jnp.float32(V - 1), volume)
    margin_small = min(0.5, cfg.volume_margin)
    t_small = jnp.maximum(
        jnp.round(t * (1.0 - margin_small)), jnp.minimum(100.0, volume)
    )
    t_big = jnp.minimum(
        jnp.float32(V - 1), jnp.round(volume * (1.0 + cfg.volume_margin))
    )
    ns = jnp.stack([t, t_small, t_big], axis=-1)  # (B, 3)
    masks = topn_masks_multi_batched(masked_x, ns, iters=cfg.topn_iters)
    masks = masks * ball[:, None]  # (B, 3, D, H, W)

    # -- 4. dilation fallback when too few positive voxels existed ------------
    # (reference :1512-1522: for small tumors, grow the selection if the ball
    # was mostly outside the organ segment.)
    def _needs_fallback(m):
        small_tumor = volume < jnp.float32(50**3)
        return small_tumor & (jnp.sum(m[:, 0], axis=(1, 2, 3)) < 0.7 * volume)

    def fb_cond(state):
        m, it = state
        return jnp.any(_needs_fallback(m)) & (it < 6)

    def fb_body(state):
        m, it = state
        m2 = dilate_cf(m, 7) * ball[:, None]  # (B, 3, D, H, W), spatial-minor
        grow = _needs_fallback(m)[:, None, None, None, None]
        return jnp.where(grow, m2, m), it + 1

    masks, _ = lax.while_loop(fb_cond, fb_body, (masks, jnp.int32(0)))
    return masks[:, 0], masks[:, 1], masks[:, 2]


def isolate_tumor(x, diameter, volume, cfg: BallLossConfig):
    """Single-item `isolate_tumor_batched` (kept as the tested public API).

    `x`: (D, H, W); `diameter`, `volume`: traced scalars.
    Returns (mask, mask_small, mask_big), each (D, H, W) float32 in {0,1}.
    """
    d = jnp.asarray(diameter, jnp.float32).reshape(1)
    v = jnp.asarray(volume, jnp.float32).reshape(1)
    m, ms, mb = isolate_tumor_batched(x[None], d, v, cfg)
    return m[0], ms[0], mb[0]


def _tumor_branch_batched(x_logits, tumor_seg, penalize, volumes, diameters,
                          cfg, c_weight, item_valid):
    """Ball-loss for every batch item at once (items without tumors run with
    their work masked out; callers discard their results).

    x_logits: (B, D, H, W) logits of each item's active lesion channel.
    tumor_seg: (B, D, H, W) dilated organ sub-segment.
    penalize:  (B, D, H, W) penalisable region for the active channel.
    volumes: (B, T), diameters: (B, T, 3), c_weight/item_valid: (B,).
    Returns (loss_bce, loss_dice), each (B,).
    """
    # the whole pseudo-mask construction is supervision-target work: primal
    # only (matches the reference, where topk/scatter targets carry no grad)
    x_act = lax.stop_gradient(
        jax.nn.sigmoid(x_logits.astype(jnp.float32)) * tumor_seg
    )

    # sort tumor slots by volume, descending per item (reference :1678-1681)
    order = jnp.argsort(-volumes, axis=-1)
    volumes = jnp.take_along_axis(volumes, order, axis=-1)
    diameters = jnp.take_along_axis(diameters, order[..., None], axis=-2)
    max_dias = jnp.max(diameters, axis=-1)  # (B, T)

    # reference clamps (:1706-1710): diameter <= 1 -> 3, volume <= 1 -> 9
    max_dias = jnp.where(max_dias <= 1.0, 3.0, max_dias)
    vols = jnp.where(volumes <= 1.0, 9.0, volumes)
    valid = (volumes > 0) & item_valid[:, None]  # (B, T)
    # slots are volume-sorted, so per-item validity is a PREFIX and slot t is
    # live iff ANY item has >= t+1 tumors: the loop runs exactly
    # max-tumor-count iterations — dead slots cost nothing (the previous
    # scan-over-T dispatched a conditional per slot, live or not)
    n_live = jnp.sum(jnp.any(valid, axis=0).astype(jnp.int32))

    # the loop carries the RUNNING UNIONS of the pseudo/big masks instead of
    # emitting per-slot (T, B, D, H, W) stacks and reducing afterwards — only
    # the unions are ever consumed, and keeping them in the carry removes
    # ~4 volumes of HBM writes + re-reads per slot. Everything inside is
    # supervision-target work on stop_gradient inputs, so the while_loop
    # never sees a tangent.
    volsT, diasT, validT = vols.T, max_dias.T, valid.T  # (T, B)

    def slot_body(state):
        s, x_iter, u_sel, u_big = state
        vol = lax.dynamic_index_in_dim(volsT, s, keepdims=False)
        dia = lax.dynamic_index_in_dim(diasT, s, keepdims=False)
        ok = lax.dynamic_index_in_dim(validT, s, keepdims=False)
        m, ms, mb = isolate_tumor_batched(x_iter, dia, vol, cfg)
        okf = ok[:, None, None, None].astype(jnp.float32)
        sel = (ms if cfg.use_small_pseudo_mask else m) * okf
        return (s + 1, x_iter * (1.0 - m * okf),
                jnp.maximum(u_sel, sel), jnp.maximum(u_big, mb * okf))

    zero_u = jnp.zeros_like(x_act)
    _, _, pseudo, big = lax.while_loop(
        lambda st: st[0] < n_live, slot_body,
        (jnp.int32(0), x_act, zero_u, zero_u),
    )  # pseudo/big: (B, D, H, W) binary unions
    if cfg.dilation_for_background > 0:
        big = dilate_cf(big, cfg.dilation_for_background)
    border = jnp.clip(big - pseudo, 0.0, 1.0)
    penalize = penalize * (1.0 - border)

    pseudo = lax.stop_gradient(pseudo)
    big = lax.stop_gradient(big)
    penalize = lax.stop_gradient(penalize)

    bce = bce_with_logits(x_logits, pseudo) * penalize  # (B, D, H, W)
    spatial_mean = lambda a: jnp.mean(a, axis=(1, 2, 3))

    if cfg.standard_ce:
        loss_bce = spatial_mean(bce) * c_weight
    else:
        if cfg.gwrp:
            n_fg = jnp.sum(pseudo, axis=(1, 2, 3))  # (B,)
            boosted = (
                jax.nn.sigmoid(x_logits.astype(jnp.float32)) * pseudo + pseudo
            )
            w = jax.vmap(
                lambda b_i, n_i: gwrp_weights_binned(
                    b_i, jnp.maximum(n_i, 1.0), cfg.gwrp_concentration,
                    levels=cfg.gwrp_levels,
                )
            )(boosted, n_fg)
            w = lax.stop_gradient(w * n_fg[:, None, None, None] * pseudo)
            loss_fg = spatial_mean(bce * w)
        else:
            loss_fg = spatial_mean(bce * pseudo)
        loss_bg = spatial_mean(bce * (1.0 - big))
        loss_bce = (loss_fg + loss_bg) * c_weight

    dice = jax.vmap(
        lambda xl, ps, pn: _tversky_cf(xl[None], ps[None], pn[None])
    )(x_logits, pseudo, penalize)
    return loss_bce, dice * c_weight


def _no_tumor_branch_batched(out_logits, to_penalize, cw_lesion):
    """BCE toward zero over the penalisable region for all lesion channels
    (reference :1624-1661). out_logits/to_penalize: (B, L, D, H, W);
    cw: (B, L). Returns ((B,), (B,))."""
    zeros = jnp.zeros_like(out_logits)
    bce = bce_with_logits(out_logits, zeros) * to_penalize
    loss = jnp.mean(bce * cw_lesion[:, :, None, None, None], axis=(1, 2, 3, 4))
    dice = jax.vmap(
        lambda o, p, c: _tversky_cf(o, jnp.zeros_like(o), p, class_weights=c)
    )(out_logits, to_penalize, cw_lesion)
    return loss, dice


def lesion_masks_cf(
    labels,
    unk_voxels,
    chosen_segment_mask,
    lmap: LesionChannelMap,
    subseg_dilation: int = 31,
    unk_dilation: int = 1,
):
    """Precompute the lesion-space (channel-first) mask tensors shared by the
    ball and volume losses: (seg dilated, unk dilated, labels), each
    (B, L, D, H, W). These are pure batch data — computing them once per step
    instead of per loss head removes the dominant dilation FFTs from the
    profile (2×145 ms/step on v5e)."""
    to_cf = lambda t: jnp.moveaxis(t, -1, 1)
    seg = dilate_cf(to_cf(lmap.merge(chosen_segment_mask)).astype(jnp.float32),
                    subseg_dilation)
    unk = dilate_cf(to_cf(lmap.merge(unk_voxels)).astype(jnp.float32),
                    unk_dilation)
    lab = to_cf(lmap.merge(labels)).astype(jnp.float32)
    return jax.lax.stop_gradient((seg, unk, lab))


def ball_loss(
    logits,
    labels,
    unk_voxels,
    chosen_segment_mask,
    tumor_volumes,
    tumor_diameters,
    lmap: LesionChannelMap,
    cfg: BallLossConfig = BallLossConfig(),
    class_weights: Optional[jnp.ndarray] = None,
    precomputed=None,
):
    """R-Super Ball Loss over a batch (``ball_loss``, ``losses_foundation.py:1537``).

    Args (channels-last):
      logits, labels, unk_voxels, chosen_segment_mask: (B, D, H, W, C).
      tumor_volumes: (B, T) voxels; tumor_diameters: (B, T, 3) mm (= voxels at
        1 mm³ spacing); zero-padded slots.
      class_weights: optional (B, C).
      precomputed: optional `lesion_masks_cf` result shared across heads.

    Returns dict {'ball_loss_bce', 'ball_loss_dice'} of scalars.
    """
    # Channel-first internal layout (B, L, D, H, W) — see volume.py note on
    # tiny-lane-count padding.
    to_cf = lambda t: jnp.moveaxis(t, -1, 1)
    out = to_cf(lmap.merge(logits))
    if precomputed is None:
        precomputed = lesion_masks_cf(
            labels, unk_voxels, chosen_segment_mask, lmap,
            cfg.subseg_dilation, cfg.unk_dilation,
        )
    seg, unk, lab = precomputed

    to_penalize = (
        (1.0 - unk) * (1.0 - lab) + seg > 0
    ).astype(jnp.float32)  # (B, L, D, H, W)

    if class_weights is not None:
        cw = lmap.merge(class_weights.astype(jnp.float32))  # (B, L)
    else:
        cw = jnp.ones((out.shape[0], out.shape[1]), jnp.float32)

    gate = jnp.sum(seg, axis=(2, 3, 4)) > 0  # (B, L)
    active = jnp.argmax(gate, axis=-1)  # (B,)
    has_tumor = jnp.any(gate, axis=-1) & (
        jnp.sum(tumor_volumes, axis=-1) > 0
    )  # (B,)

    B = out.shape[0]
    # batched active-channel extraction (contractions, not per-item gathers)
    onehot_act = jax.nn.one_hot(active, out.shape[1], dtype=jnp.float32)
    x_act_ch = jnp.einsum("bldhw,bl->bdhw", out, onehot_act)
    pen_act = jnp.einsum("bldhw,bl->bdhw", to_penalize, onehot_act)
    tumor_seg = jnp.sum(seg, axis=1)  # only the active channel is nonzero
    c_weight = jnp.sum(cw * onehot_act, axis=1)  # (B,)

    zeros_b = jnp.zeros((B,), jnp.float32)
    # all-mask-only batches skip the whole pseudo-mask construction
    bce_t, dice_t = lax.cond(
        jnp.any(has_tumor),
        lambda args: _tumor_branch_batched(
            args[0], args[1], args[2], args[3], args[4], cfg, args[5], args[6]
        ),
        lambda args: (zeros_b, zeros_b),
        (x_act_ch, tumor_seg, pen_act, tumor_volumes, tumor_diameters,
         c_weight, has_tumor),
    )
    bce_n, dice_n = lax.cond(
        jnp.any(~has_tumor),
        lambda args: _no_tumor_branch_batched(*args),
        lambda args: (zeros_b, zeros_b),
        (out, to_penalize, cw),
    )
    losses_bce = jnp.where(has_tumor, bce_t, bce_n)
    losses_dice = jnp.where(has_tumor, dice_t, dice_n)
    out_losses = {"ball_loss_bce": jnp.mean(losses_bce)}
    if cfg.apply_dice_loss:
        out_losses["ball_loss_dice"] = jnp.mean(losses_dice)
    else:
        out_losses["ball_loss_dice"] = jnp.zeros(())
    return out_losses
