"""Device-mesh helpers for data-parallel (cell-sharded) execution.

The reference's only parallelism is a fork-based process pool over cell
chunks (reference: tl/_infercnv.py:120-135).  The TPU-native equivalent is a
1-D ``jax.sharding.Mesh`` over the cell axis: expression rows are sharded,
the genome plan / reference baseline are replicated, and cluster statistics
reduce with XLA collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["cell_mesh", "shard_cells", "replicate"]

CELL_AXIS = "cells"


def cell_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name 'cells'."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (CELL_AXIS,))


def shard_cells(mesh: Mesh) -> NamedSharding:
    """Sharding that splits the leading (cell) axis across the mesh."""
    return NamedSharding(mesh, P(CELL_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (genome plan, reference baseline, weights)."""
    return NamedSharding(mesh, P())
