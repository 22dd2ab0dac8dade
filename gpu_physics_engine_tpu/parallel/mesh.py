"""Device mesh helpers for multi-chip runs.

Net-new relative to the reference, which is strictly single-device
(SURVEY.md §2.4: no NCCL/MPI/multi-GPU anywhere).  Scaling a spatial
simulation across TPU chips is spatial domain decomposition: a 1D
``Mesh`` over chips, the world cut into vertical slabs, halo exchange of
boundary particles over ICI via ``jax.lax.ppermute`` (see parallel/halo.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(n_devices: int | None = None, axis: str = "shards") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    return Mesh(np.array(devices[:n]), (axis,))


def shard_leading(mesh: Mesh, axis: str = "shards") -> NamedSharding:
    """Sharding that splits an array's leading dim across the mesh."""
    return NamedSharding(mesh, PartitionSpec(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
