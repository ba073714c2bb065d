"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on simulated devices (the facility the CUDA
reference lacks entirely — it is single-GPU only); real-TPU benchmarking is
done by bench.py, not the test suite.
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
