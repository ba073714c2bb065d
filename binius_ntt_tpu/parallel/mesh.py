"""Device mesh helpers.

The reference is single-GPU/single-process (SURVEY.md §5); all multi-chip
structure here is new, TPU-native design: a 1-D mesh over the element axis,
with collectives riding ICI.  Multi-host initialisation hooks through
``jax.distributed`` when launched under a multi-process runtime.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "AXIS"]

AXIS = "x"


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the first `n_devices` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))
