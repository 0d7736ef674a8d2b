"""Device-mesh construction for the sharded execution path.

The estimation itself lives in pyrhe_tpu.parallel.sharded (jackknife
blocks sharded over a 1-D "jack" axis, totals merged with one psum over
ICI/DCN — the TPU-native replacement for the reference's multiprocessing
+ POSIX shared-memory fan-out, reference base.py:432-437, mp_handler.py).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "jack") -> Mesh:
    """1-D mesh over the first n_devices GLOBAL devices (all by default).
    Under multi-process execution every process builds the same mesh."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))
