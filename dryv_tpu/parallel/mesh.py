"""Device mesh helpers."""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(axis_sizes: dict[str, int] | None = None) -> Mesh:
    """Build a Mesh over available devices.

    axis_sizes: e.g. {"gop": 2, "band": 4}; defaults to 1-D ("gop", N)."""
    devs = jax.devices()
    if axis_sizes is None:
        axis_sizes = {"gop": len(devs)}
    shape = tuple(axis_sizes.values())
    n = int(np.prod(shape))
    assert n <= len(devs), f"need {n} devices, have {len(devs)}"
    arr = np.array(devs[:n]).reshape(shape)
    return Mesh(arr, tuple(axis_sizes.keys()))
