"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on simulated devices (the facility the CUDA
reference lacks entirely — it is single-GPU only); real-TPU benchmarking is
done by bench.py, not the test suite.

Note: a site hook in this environment may force ``jax_platforms`` to the TPU
backend via ``jax.config.update`` (which beats the JAX_PLATFORMS env var), so
we override through the config API and clear any already-initialised
backends before the first test imports jax arrays.
"""

import os

# Must be set before the CPU client is created.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():
        from jax.extend.backend import clear_backends

        clear_backends()
except Exception:
    pass

# Persistent compilation cache: repeated test runs skip recompilation.
jax.config.update("jax_enable_compilation_cache", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
