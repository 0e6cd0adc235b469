"""Microbench: Pallas channel-last depthwise conv vs XLA grouped conv.

Times the three MedFormer depthwise sites (MBConv FF / patch-merging) at
their production shapes for the 96^3 train step, fwd and fwd+bwd.
Run on the real chip:
  env PYTHONPATH=/root/repo:/root/.axon_site \
      JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
      python tools/bench_dwconv.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from rsuper_tpu.ops import dwconv


def timeit(fn, *args, reps=20):
    # fn returns a SCALAR (reduced inside the jit): fetching a raw tensor
    # element through the relay devolves into a slow gather and poisons the
    # measurement (first version of this tool measured 16 s "fwd" times)
    float(fn(*args))  # compile + settle
    float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}")
    # (B, D, H, W, C): MedFormer 96^3 sites (down1/down2/down3 MBConv)
    # and the 128^3-training variants of the largest one
    sites = [
        (1, 48, 48, 48, 256, jnp.bfloat16),
        (1, 24, 24, 24, 512, jnp.bfloat16),
        (1, 12, 12, 12, 1024, jnp.bfloat16),
        (1, 64, 64, 64, 256, jnp.bfloat16),
    ]
    for (B, D, H, W, C, dt) in sites:
        x = jnp.asarray(rng.normal(size=(B, D, H, W, C)), dt)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, 1, C)) * 0.2, jnp.float32)
        sup = dwconv.dw_supported(x.shape, x.dtype)

        def loss_pal(x, w):
            return jnp.sum(
                dwconv.depthwise_conv3x3x3(
                    x, w, force_pallas=True).astype(jnp.float32) ** 2)

        def loss_xla(x, w):
            return jnp.sum(dwconv._dw_xla(x, w).astype(jnp.float32) ** 2)

        f_pal = jax.jit(loss_pal)
        f_xla = jax.jit(loss_xla)
        g_pal = jax.jit(lambda x, w: sum(
            jnp.sum(g.astype(jnp.float32) ** 2)
            for g in jax.grad(loss_pal, (0, 1))(x, w)))
        g_xla = jax.jit(lambda x, w: sum(
            jnp.sum(g.astype(jnp.float32) ** 2)
            for g in jax.grad(loss_xla, (0, 1))(x, w)))

        row = [f"{D}^3/{C} {np.dtype(dt).name} sup={sup}"]
        if sup:
            row.append(f"pal fwd {timeit(f_pal, x, w):7.3f} ms")
        row.append(f"xla fwd {timeit(f_xla, x, w):7.3f} ms")
        if sup:
            row.append(f"pal grad {timeit(g_pal, x, w):7.3f} ms")
        row.append(f"xla grad {timeit(g_xla, x, w):7.3f} ms")
        hbm = x.size * x.dtype.itemsize / 1e6
        row.append(f"[{hbm:.0f} MB/tensor]")
        print("  ".join(row))


if __name__ == "__main__":
    main()
