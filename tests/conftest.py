"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding/collective code paths are
exercised on XLA's host platform with 8 virtual devices (the standard JAX
recipe for testing `Mesh`/`pjit` code without TPUs).

Note: this environment's sitecustomize registers a remote-TPU ("axon") PJRT
plugin and pins ``jax_platforms`` to it via jax.config — plain
``JAX_PLATFORMS=cpu`` env forcing is NOT enough; the config value must be
overridden after import, before any backend initialisation.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compile cache: the suite is compile-dominated (jitted train
# steps over the virtual mesh); repeat runs hit the cache and drop from
# ~27 min to minutes
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
assert jax.devices()[0].platform == "cpu"
