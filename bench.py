#!/usr/bin/env python
"""Benchmark: R-Super training throughput on one TPU chip.

Measures the FULL R-Super train step — MedFormer 3D forward+backward with the
complete loss stack (masked BCE + adaptive-Tversky Dice + Volume Loss + Ball
Loss, `ball_dice_last` routing) + AdamW + EMA — on 96³ CT patches, and prints
one JSON line:

    {"metric": "train_patches_per_sec_per_chip_96", "value": ..., ...}

vs_baseline: the reference trains MedFormer fp32 on A100s (AMP disabled as
unstable, ``train_ddp.py:315``; >30 GB at 128³ / ~20 GB at 96³ per
``Merlin_demo.md:156-181``) but publishes no throughput. The baseline used
here is 2.0 patches/s/GPU at 96³ — an fp32-A100 estimate for this ~3.5
TFLOP/patch forward+backward at typical 3D-conv utilisation — so
vs_baseline = value / 2.0. BASELINE.md records that throughput must be
measured fresh; this constant makes the ratio's meaning explicit.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_PATCHES_PER_SEC = 2.0
BATCH = int(os.environ.get("RSUPER_BENCH_BATCH", "1"))  # per-chip; DP scales it
SIZE = int(os.environ.get("RSUPER_BENCH_SIZE", "96"))
# rematerialisation trades ~45% extra model time for activation memory; at
# 96³ batch 1 everything fits without it (see docs/perf.md round-2 numbers)
REMAT = os.environ.get("RSUPER_BENCH_REMAT", "0") == "1"
# loss-stack attribution: 'dice' isolates model+seg cost; the default runs
# the full R-Super report losses (ball_dice_last)
LOSS = os.environ.get("RSUPER_BENCH_LOSS", "ball_dice_last")
CLASSES = [
    "background", "aorta", "gall_bladder", "kidney_left", "kidney_right",
    "kidney_lesion", "liver", "liver_lesion", "pancreas", "pancreas_head",
    "pancreas_body", "pancreas_tail", "pancreatic_lesion", "postcava",
    "spleen", "stomach",
]


def smoke():
    """Real-lowering gate for the Pallas kernels (VERDICT r2 weak #4).

    Interpret mode cannot catch Mosaic lowering failures (block-shape rules,
    bf16 dot mis-lowering, scoped-VMEM overflows — CLAUDE.md has the list);
    this compiles and runs every kernel mode on the REAL backend with tiny
    shapes and checks numerics against the XLA path. Exits nonzero on any
    failure so the round workflow can gate on it. Graphs are tiny and land in
    the persistent compile cache, so re-runs are seconds.
    """
    import numpy as np

    import jax
    import jax.numpy as jnp

    failures = []

    def check(name, fn):
        try:
            fn()
            print(f"smoke {name}: ok", flush=True)
        except Exception as e:  # noqa: BLE001 - report every kernel
            failures.append(name)
            print(f"smoke {name}: FAIL {type(e).__name__}: {e}", flush=True)

    from rsuper_tpu.ops import conv_cf
    from rsuper_tpu.ops.pallas_topn import pallas_topn_threshold_multi_batched

    rng = np.random.default_rng(0)

    def conv_case(name, C, Co, S, dtype):
        # (B, D, C, H, W) — the CF stages' depth-major channel-first layout
        x = jnp.asarray(rng.normal(size=(1, S[0], C, S[1], S[2])), dtype)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, C, Co)) * 0.2, jnp.float32)

        def run():
            def f(x, w):
                y = conv_cf.conv3x3x3_cf(x, w, force_pallas=True)
                return jnp.sum(y.astype(jnp.float32) ** 2), y

            (loss, y), (gx, gw) = jax.value_and_grad(
                f, argnums=(0, 1), has_aux=True
            )(x, w)
            ref = conv_cf._conv3_cf_xla(x, w.astype(x.dtype))
            ref32 = ref.astype(jnp.float32)
            err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - ref32)))
            scale = max(1.0, float(jnp.max(jnp.abs(ref32))))
            # bf16 tolerance is relative: chunked outputs round to bf16 in
            # the kernel (~1 ulp ≈ 0.4% each), and values grow with √(27·C)
            tol = (0.02 if dtype == jnp.bfloat16 else 1e-4) * scale
            assert err < tol, f"fwd mismatch {err} (scale {scale})"
            assert np.isfinite(float(loss))
            assert np.isfinite(float(jnp.sum(gx.astype(jnp.float32))))
            assert np.isfinite(float(jnp.sum(gw)))

        check(name, run)

    # whole-plane concat mode (the 96³ stages)
    conv_case("conv_cf_plane_bf16", 8, 8, (8, 32, 32), jnp.bfloat16)
    # the decoder's 96³ concat-input conv (64ch -> 32ch): channels chunk to
    # concat-capable sizes (plane-size-aware ceiling) — per-tap mode proved
    # fragile against compiler scheduling (25-51M scoped VMEM observed)
    conv_case("conv_cf_decoder_bf16", 64, 32, (4, 96, 96), jnp.bfloat16)
    # H-tiled mode — the 128³ path (plane > 96², W 128-divisible)
    conv_case("conv_cf_ht_bf16", 8, 8, (4, 128, 128), jnp.bfloat16)
    # H-tiled + channel chunking (the decoder's 96-ch concat input at 128³)
    conv_case("conv_cf_ht_chunked_bf16", 96, 32, (4, 128, 128), jnp.bfloat16)
    # f32 plane past the f32 byte budget (4608 < S=8192 <= 9216): the gate
    # admits it via the H-tiled clause, so the dispatch MUST H-tile it too —
    # whole-plane f32 at this size retains >16M scoped VMEM (review r3 #2)
    conv_case("conv_cf_ht_f32", 8, 8, (4, 64, 128), jnp.float32)

    def fused_case(name, C, Co, S, dtype):
        x = jnp.asarray(rng.normal(size=(1, S[0], C, S[1], S[2])), dtype)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, C, Co)) * 0.2, jnp.float32)

        def run():
            def f(x, w):
                y = conv_cf.in_relu_conv3x3x3_cf(x, w, force_pallas=True)
                return jnp.sum(y.astype(jnp.float32) ** 2), y

            (loss, y), (gx, gw) = jax.value_and_grad(
                f, argnums=(0, 1), has_aux=True
            )(x, w)
            ref = conv_cf._in_relu_conv_xla(x, w, 1e-4)
            ref32 = ref.astype(jnp.float32)
            err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - ref32)))
            scale = max(1.0, float(jnp.max(jnp.abs(ref32))))
            tol = (0.02 if dtype == jnp.bfloat16 else 1e-4) * scale
            assert err < tol, f"fwd mismatch {err} (scale {scale})"
            assert np.isfinite(float(loss))
            assert np.isfinite(float(jnp.sum(gx.astype(jnp.float32))))
            assert np.isfinite(float(jnp.sum(gw)))

        check(name, run)

    # fused IN+relu epilogue: whole-plane (full-res 96³ stage shape),
    # H-tiled (128³), and the chunked decoder concat input
    fused_case("fused_in_relu_plane_bf16", 8, 8, (8, 32, 32), jnp.bfloat16)
    fused_case("fused_in_relu_ht_bf16", 8, 8, (4, 128, 128), jnp.bfloat16)
    fused_case("fused_in_relu_chunked_bf16", 64, 32, (4, 96, 96), jnp.bfloat16)
    # paired conv+shortcut (BasicBlockCF stacks both weights along C_out):
    # the UpBlockMF_3 (96->64 @ 96²), UpBlockMF_2 (192->128 @ 48²) and the
    # 128³ H-tiled variant of the first
    fused_case("fused_pair_96_bf16", 96, 64, (4, 96, 96), jnp.bfloat16)
    fused_case("fused_pair_48_bf16", 192, 128, (4, 48, 48), jnp.bfloat16)
    fused_case("fused_pair_ht_bf16", 96, 64, (4, 128, 128), jnp.bfloat16)

    from rsuper_tpu.ops import dwconv

    def dw_case(name, C, S, dtype):
        x = jnp.asarray(rng.normal(size=(1, S[0], S[1], S[2], C)), dtype)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, 1, C)) * 0.2, jnp.float32)

        def run():
            def f(x, w):
                y = dwconv.depthwise_conv3x3x3(x, w, force_pallas=True)
                return jnp.sum(y.astype(jnp.float32) ** 2), y

            (loss, y), (gx, gw) = jax.value_and_grad(
                f, argnums=(0, 1), has_aux=True
            )(x, w)
            ref = dwconv._dw_xla(x, w).astype(jnp.float32)
            err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - ref)))
            scale = max(1.0, float(jnp.max(jnp.abs(ref))))
            tol = (0.02 if dtype == jnp.bfloat16 else 1e-4) * scale
            assert err < tol, f"fwd mismatch {err} (scale {scale})"
            assert np.isfinite(float(loss))
            assert np.isfinite(float(jnp.sum(gx.astype(jnp.float32))))
            assert np.isfinite(float(jnp.sum(gw)))

        check(name, run)

    # the MedFormer depthwise sites (MBConv FF + patch-merging reduction):
    # C in {256, 512, 1024} — tiny spatial stand-ins for 48^3/24^3/12^3
    dw_case("dwconv_256_bf16", 256, (4, 8, 8), jnp.bfloat16)
    dw_case("dwconv_512_bf16", 512, (3, 8, 8), jnp.bfloat16)
    dw_case("dwconv_1024_f32", 1024, (3, 8, 8), jnp.float32)

    def topn():
        x = jnp.asarray(rng.normal(size=(2, 4096)), jnp.float32)
        ns = jnp.asarray([[64.0, 16.0], [256.0, 8.0]], jnp.float32)
        thr = pallas_topn_threshold_multi_batched(x, ns)
        counts = jnp.sum(
            x[:, None, :] >= thr[..., None], axis=-1
        )
        assert np.allclose(np.asarray(counts), np.asarray(ns), atol=2), counts

    check("pallas_topn_batched", topn)

    if failures:
        print(json.dumps({"smoke": "fail", "failures": failures}))
        sys.exit(1)
    print(json.dumps({"smoke": "ok", "backend": jax.default_backend()}))


def main():
    if "--smoke" in sys.argv:
        try:
            jax.config.update("jax_compilation_cache_dir",
                              os.environ["JAX_COMPILATION_CACHE_DIR"])
        except Exception:
            pass
        smoke()
        return
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    from rsuper_tpu.losses import LesionChannelMap, LossConfig
    from rsuper_tpu.models import get_model
    from rsuper_tpu.train import build_train_step, make_optimizer
    from rsuper_tpu.train.loop import init_params_on_host
    from rsuper_tpu.train.state import TrainState

    dev = jax.devices()[0]
    lmap = LesionChannelMap.from_classes(CLASSES)
    C = len(CLASSES)
    model = get_model("medformer", C, {"remat": REMAT}, dtype=jnp.bfloat16)
    tx = make_optimizer(base_lr=6e-4, warmup_epochs=0, max_epochs=100,
                        steps_per_epoch=1000)

    rng = np.random.default_rng(0)
    ci = CLASSES.index("pancreatic_lesion")
    seg = np.zeros((BATCH, SIZE, SIZE, SIZE, C), np.float32)
    seg[0, 24:72, 24:72, 24:72, ci] = 1.0
    lab = np.zeros_like(seg)
    if BATCH > 1:
        lab[1, 20:60, 20:60, 20:60, CLASSES.index("pancreas")] = 1.0
    vols = np.zeros((BATCH, 10), np.float32)
    vols[0, :2] = [4000.0, 900.0]
    dias = np.zeros((BATCH, 10, 3), np.float32)
    dias[0, 0] = [20.0, 18.0, 16.0]
    dias[0, 1] = [12.0, 12.0, 10.0]
    batch = {
        "image": rng.normal(size=(BATCH, SIZE, SIZE, SIZE, 1)).astype(np.float32),
        "label": lab,
        "unk": seg.copy(),
        "segment_mask": seg,
        "volumes": vols,
        "diameters": dias,
    }
    # training dtype in = what the real loop feeds after device_augment:
    # bf16 image (the model casts anyway) and bf16 binary masks (exact)
    bf16_keys = ("image", "label", "unk", "segment_mask")
    batch = {
        k: jax.device_put(
            jnp.asarray(v, jnp.bfloat16 if k in bf16_keys else None), dev)
        for k, v in batch.items()
    }

    params = init_params_on_host(
        model, jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, SIZE, 1))
    )
    state = TrainState(
        params=jax.device_put(params, dev),
        opt_state=jax.device_put(tx.init(params), dev),
        ema_params=jax.device_put(jax.tree.map(jnp.copy, params), dev),
        step=jax.device_put(jnp.zeros((), jnp.int32), dev),
        tx=tx,
    )

    step = build_train_step(model, lmap, LossConfig(loss=LOSS))

    # warm-up / compile
    state, losses = step(state, batch)
    _ = float(losses["overall"])  # full sync

    iters = 10
    t0 = time.time()
    for _ in range(iters):
        state, losses = step(state, batch)
    _ = float(losses["overall"])  # sync the whole chain
    elapsed = time.time() - t0

    value = BATCH * iters / elapsed
    # the A100 baseline was derived at 96³ (BASELINE.md); patch FLOPs scale
    # with voxel count, so other sizes compare against the scaled figure
    baseline = BASELINE_PATCHES_PER_SEC * (96.0 / SIZE) ** 3
    print(json.dumps({
        "metric": f"train_patches_per_sec_per_chip_{SIZE}" + ("" if LOSS == "ball_dice_last" else f"_{LOSS}"),
        "value": round(value, 3),
        "unit": f"{SIZE}^3 CT patches/s/chip (MedFormer fwd+bwd, full R-Super losses)",
        "vs_baseline": round(value / baseline, 3),
    }))


if __name__ == "__main__":
    main()
