"""Mesh helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_shard_mesh(n_devices: int | None = None, axis: str = "shards") -> Mesh:
    """1-D device mesh along the shard-placement axis.

    On a single chip this is the degenerate 1-device mesh; tests use the
    virtual 8-device CPU backend.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices but only {len(devices)} available"
        )
    return Mesh(np.array(devices[:n_devices]), (axis,))
