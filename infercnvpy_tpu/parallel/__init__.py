"""Distributed runtime: device meshes and cell-sharded execution (SURVEY.md §7 L3)."""

from .mesh import cell_mesh, shard_cells, replicate
from .sharded import sharded_infercnv_fn

__all__ = ["cell_mesh", "shard_cells", "replicate", "sharded_infercnv_fn"]
