"""Device-mesh helpers for multi-chip scaling (SURVEY.md §5.8: the reference
has no inter-node communication at all — this subsystem is new capability,
built on `jax.sharding.Mesh` + `shard_map` so collectives ride ICI)."""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_names: Tuple[str, ...] = ("data",),
    shape: Optional[Tuple[int, ...]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh over available devices. With no shape, all devices land on
    the first axis."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)
