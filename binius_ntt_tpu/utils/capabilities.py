"""Platform preflight checks — the TPU analogue of check_gpu_capabilities.

The reference gates on CUDA device properties (>=1024 threads/block, >32KB
shared memory, grid dims; src/ulvt/utils/common.cu:6-43).  The TPU analogue
checks that a usable accelerator backend is present and reports the
capability facts the kernels actually depend on (device kind, HBM, core
count) without hard-coding a generation.
"""

from __future__ import annotations

from dataclasses import dataclass

__all__ = ["DeviceCapabilities", "check_capabilities"]


@dataclass
class DeviceCapabilities:
    platform: str
    device_kind: str
    num_devices: int
    memory_bytes: int | None

    @property
    def is_accelerator(self) -> bool:
        return self.platform not in ("cpu",)


def check_capabilities(min_devices: int = 1) -> DeviceCapabilities:
    """Raise if no backend with `min_devices` devices is available."""
    import jax

    devs = jax.devices()
    if len(devs) < min_devices:
        raise RuntimeError(
            f"need >= {min_devices} devices, found {len(devs)}")
    d = devs[0]
    mem = None
    try:
        stats = d.memory_stats()
        if stats:
            mem = stats.get("bytes_limit")
    except Exception:
        pass
    return DeviceCapabilities(
        platform=d.platform,
        device_kind=getattr(d, "device_kind", "unknown"),
        num_devices=len(devs),
        memory_bytes=mem,
    )
