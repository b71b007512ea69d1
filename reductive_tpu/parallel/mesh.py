"""Device-mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a :class:`jax.sharding.Mesh` over the available devices.

    By default all devices form a 1-D ``data`` mesh.  Pass e.g.
    ``shape=(4, 2), axis_names=("data", "model")`` for a 2-D layout where
    instances shard 4 ways and subquantizers 2 ways.  ``shape`` may contain
    one ``-1`` which absorbs the remaining devices.
    """
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if shape is None:
        shape = (n,) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape is required for multi-axis meshes")
    shape = tuple(shape)
    if shape.count(-1) > 1:
        raise ValueError("at most one mesh axis may be -1")
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        if n % known != 0:
            raise ValueError(f"{n} devices not divisible by {known}")
        shape = tuple(n // known if s == -1 else s for s in shape)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not match {n} devices")
    if len(shape) != len(axis_names):
        raise ValueError("shape and axis_names length mismatch")
    return Mesh(np.asarray(devices).reshape(shape), axis_names)
