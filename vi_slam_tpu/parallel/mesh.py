"""Device mesh construction for distributed global BA.

The reference has no distributed layer (SURVEY §2.4: single-process,
shared-memory threads). This module provides the TPU-native equivalent:
a 1-D landmark-parallel mesh ("dp") over all available devices; within a
pod slice the psum of the reduced camera system rides ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devs), (axis,))
