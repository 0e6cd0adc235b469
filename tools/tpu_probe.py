"""Quick probe: is the remote-TPU (axon) backend reachable? Exits 0/1."""
import sys

import jax

try:
    devs = jax.devices()
    import jax.numpy as jnp

    x = jnp.ones((8, 128))
    print("tpu ok:", devs, float(x.sum()))
except Exception as e:  # noqa: BLE001
    print("tpu unavailable:", type(e).__name__, str(e)[:200])
    sys.exit(1)
