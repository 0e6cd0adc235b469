"""Kernel-signature tracing for the Pallas ops.

Round 3 shipped a hand-enumerated smoke-shape list that missed the real
128³ model's paired-conv signature (Ci=64→Co=128 at S=4096) — exactly the
failure mode the gate existed to prevent. This module removes the hand
enumeration: the shape inventory is TRACED from the actual model graph, so
the hardware gate (`bench.py --smoke`) and the VMEM calibration
(`tools/calibrate_vmem.py`) cover, by construction, every pallas_call a
production config lowers — forward AND backward, post channel-chunking,
with the TD/TH the dispatch actually picks.

How: `ops/conv_cf.py` and `ops/dwconv.py` emit a dict through a trace hook
at each pallas_call dispatch point; `collect_signatures` runs
``jax.eval_shape(jax.grad(loss))`` over the full model under
``dispatch.pallas_forced()`` (so TPU dispatch decisions are taken on a CPU
host — eval_shape never compiles), and `replay_signature` re-executes one
recorded signature on the REAL backend with a shrunken depth that provably
preserves the kernel's block shapes and TD choice.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from . import conv_cf, dispatch, dwconv


def _sum_leaves(tree) -> jax.Array:
    total = jnp.float32(0.0)
    for leaf in jax.tree.leaves(tree):
        total = total + jnp.sum(leaf.astype(jnp.float32) ** 2)
    return total


def collect_signatures(size: int, arch: str = "medformer",
                       num_classes: int = 16, batch: int = 1,
                       model_args: Dict[str, Any] | None = None,
                       dtype=jnp.bfloat16) -> List[Dict[str, Any]]:
    """Trace one model config's full fwd+bwd graph and return the deduped
    kernel-signature list (order preserved; first occurrence wins)."""
    from ..models import get_model

    model = get_model(arch, num_classes, model_args or {}, dtype=dtype)
    x_sds = jax.ShapeDtypeStruct((batch, size, size, size, 1), jnp.float32)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), x_sds)

    sigs: List[Dict[str, Any]] = []

    def hook(sig):
        sigs.append(sig)

    prev_cv, prev_dw = conv_cf._trace_hook, dispatch._dw_trace_hook
    conv_cf._trace_hook = hook
    dispatch._dw_trace_hook = hook
    try:
        with dispatch.pallas_forced():
            jax.eval_shape(
                jax.grad(lambda p, x: _sum_leaves(model.apply(p, x))),
                params, x_sds,
            )
    finally:
        conv_cf._trace_hook = prev_cv
        dispatch._dw_trace_hook = prev_dw
    return dedupe(sigs)


def sig_key(sig: Dict[str, Any]):
    """Identity of a signature for dedup/coverage: everything that shapes
    the pallas_call's blocks and kernel body. B and D are excluded (they
    only change the grid extent) EXCEPT through the picked td/th, which is
    kept — the same (S, Ci, Co) at different real depths can pick different
    TDs, and each picked TD is its own lowering."""
    if sig["op"] == "dwconv":
        return ("dwconv", sig["kind"], sig["H"], sig["W"], sig["C"],
                sig["dtype"])
    return ("conv_cf", sig["kind"], sig["mode"], sig["H"], sig["W"],
            sig["Ci"], sig["Co"], sig["dtype"], sig["fused"],
            sig.get("td"), sig.get("th"), sig.get("form"))


def dedupe(sigs: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
    seen, out = set(), []
    for s in sigs:
        k = sig_key(s)
        if k not in seen:
            seen.add(k)
            out.append(s)
    return out


def _smoke_depth(sig, td=None) -> int:
    """Replay depth: 2 grid steps of the (forced) TD — preserves block
    shapes, double-buffering, and the edge-halo masking paths; grid extent
    itself does not change Mosaic's scoped allocation."""
    if sig["op"] == "dwconv" or sig["mode"] == "ht":
        return 4
    t = td if td is not None else sig.get("td", 1)
    return max(2, 2 * t)


def _conv_operands(sig, rng, td=None):
    dtype = jnp.dtype(sig["dtype"])
    D = _smoke_depth(sig, td)
    Ci, Co, H, W = sig["Ci"], sig["Co"], sig["H"], sig["W"]
    x = jnp.asarray(rng.normal(size=(1, D, Ci, H, W)), dtype)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, Ci, Co)) * 0.2, jnp.float32)
    stats = conv_cf._in_stats_cf(x, 1e-4) if sig["fused"] else None
    return x, w.astype(dtype), stats


def _conv_ref_act(x, stats):
    """The activation the fused epilogue applies, in XLA (for goldens)."""
    if stats is None:
        return x
    scale = stats[:, 0, :, 0][:, None, :, None, None]
    shift = stats[:, 1, :, 0][:, None, :, None, None]
    return jnp.maximum(
        x.astype(jnp.float32) * scale + shift, 0.0
    ).astype(x.dtype)


def replay_signature(sig: Dict[str, Any], td: int | None = None,
                     check_numerics: bool = True,
                     interpret: bool = False,
                     form: str | None = None,
                     time_iters: int = 0) -> float | None:
    """Execute one traced signature's pallas_call on the current backend,
    asserting numerics against the XLA path. `td` pins the whole-plane depth
    tile and `form` the dot formulation (both default to the dispatch's live
    pick). Raises on lowering failure or mismatch — callers turn that into a
    gate/calibration verdict. With `time_iters` > 0, additionally times the
    jitted op at a deeper volume and returns ms/call (two-point measurement:
    (t[n+iters] − t[n]) / iters with scalar fetches, cancelling the relay's
    fixed dispatch latency — block_until_ready timings through the relay are
    unreliable)."""
    rng = np.random.default_rng(0)
    if sig["op"] == "dwconv":
        dtype = jnp.dtype(sig["dtype"])
        D, H, W, C = _smoke_depth(sig), sig["H"], sig["W"], sig["C"]
        x = jnp.asarray(rng.normal(size=(1, D, H, W, C)), dtype)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, 1, C)) * 0.2, jnp.float32)

        def f(x, w):
            y = dwconv.depthwise_conv3x3x3(x, w, force_pallas=True,
                                           interpret=interpret)
            return jnp.sum(y.astype(jnp.float32) ** 2), y

        (loss, y), (gx, gw) = jax.value_and_grad(
            f, argnums=(0, 1), has_aux=True)(x, w)
        if not check_numerics:
            jax.block_until_ready(y)
            return
        ref = dwconv._dw_xla(x, w).astype(jnp.float32)
        _assert_close(y, ref, dtype)
        for g in (gx.astype(jnp.float32), gw):
            assert bool(jnp.isfinite(jnp.sum(g))), "non-finite grad"
        return

    x, w, stats = _conv_operands(sig, rng, td)
    prev_td, prev_form = conv_cf._td_override, conv_cf._form_override
    if td is not None and sig["mode"] == "plane":
        conv_cf._td_override = td
    if form is not None:
        conv_cf._form_override = form
    try:
        if sig["kind"] == "fwd":
            y = conv_cf._conv3_cf_pallas(x, w, interpret, stats)
            if check_numerics:
                ref = conv_cf._conv3_cf_xla(_conv_ref_act(x, stats), w)
                _assert_close(y, ref, x.dtype)
            else:
                jax.block_until_ready(y)
        else:  # wgrad
            Co = sig["Co"]
            dy = jnp.asarray(
                rng.normal(size=(1, x.shape[1], Co, sig["H"], sig["W"])),
                x.dtype)
            dw = conv_cf._wgrad_pallas(x, dy, Co, interpret, stats)
            if check_numerics:
                # reference entirely in f32 (same bf16 operand values cast
                # up — both sides then accumulate in f32; mixed-dtype conv
                # transposes are not supported by lax)
                a32 = _conv_ref_act(x, stats).astype(jnp.float32)
                dy32 = dy.astype(jnp.float32)
                dw_ref = jax.grad(
                    lambda w_: jnp.sum(conv_cf._conv3_cf_xla(a32, w_) * dy32)
                )(w.astype(jnp.float32))
                _assert_close(dw, dw_ref, x.dtype)
            else:
                jax.block_until_ready(dw)
        if not time_iters:
            return None
        return _time_signature(sig, rng, td, interpret, time_iters)
    finally:
        conv_cf._td_override = prev_td
        conv_cf._form_override = prev_form


def _time_signature(sig, rng, td, interpret, iters) -> float:
    """ms/call of the jitted signature at a deeper (timing) volume. Must run
    inside the caller's override scope — the jit traces on first call."""
    import time as _time

    base = (td if td is not None else sig.get("td") or 1) \
        if sig["mode"] == "plane" else 4
    D = max(32, 4 * base)
    D -= D % base
    dtype = jnp.dtype(sig["dtype"])
    Ci, Co, H, W = sig["Ci"], sig["Co"], sig["H"], sig["W"]
    x = jnp.asarray(rng.normal(size=(1, D, Ci, H, W)), dtype)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, Ci, Co)) * 0.2, dtype)
    stats = conv_cf._in_stats_cf(x, 1e-4) if sig["fused"] else None
    if sig["kind"] == "fwd":
        fn = jax.jit(lambda a, b: conv_cf._conv3_cf_pallas(
            a, b, interpret, stats))
        args = (x, w)
    else:
        dy = jnp.asarray(rng.normal(size=(1, D, Co, H, W)), dtype)
        fn = jax.jit(lambda a, b: conv_cf._wgrad_pallas(
            a, b, Co, interpret, stats))
        args = (x, dy)

    def run(n):
        t0 = _time.perf_counter()
        y = None
        for _ in range(n):
            y = fn(*args)
        float(jnp.sum(y.astype(jnp.float32)))
        return _time.perf_counter() - t0

    run(1)  # compile + warm
    # The relay's fetch latency has multi-ms jitter; a span of iters×ms that
    # doesn't clear it produces garbage (observed: 1e-7 ms for a ~0.5 ms
    # kernel). Take the median of three two-point measurements and grow the
    # iteration count until the measured span is comfortably above jitter.
    n = iters
    while True:
        diffs = []
        for _ in range(3):
            t_a = run(2)
            t_b = run(2 + n)
            diffs.append(t_b - t_a)
        d = sorted(diffs)[1]
        if d >= 0.04 or n >= 400:
            break
        n *= 4
    return max(d, 1e-9) / n * 1000.0


def _assert_close(y, ref, dtype):
    y32 = y.astype(jnp.float32)
    ref32 = ref.astype(jnp.float32)
    err = float(jnp.max(jnp.abs(y32 - ref32)))
    scale = max(1.0, float(jnp.max(jnp.abs(ref32))))
    tol = (0.02 if jnp.dtype(dtype) == jnp.bfloat16 else 1e-4) * scale
    assert err < tol, f"mismatch {err} (scale {scale})"


def production_signatures(sizes=(96, 128), **kw) -> List[Dict[str, Any]]:
    """The union of kernel signatures across the production patch sizes —
    the authoritative coverage set for the smoke gate and calibration.
    Matches the reference's shipped configs: 96³ (Merlin demo) and 128³
    (``config/abdomenatlas_ufo/medformer_3d.yaml`` training_size)."""
    sigs: List[Dict[str, Any]] = []
    for size in sizes:
        sigs.extend(collect_signatures(size, **kw))
    return dedupe(sigs)
