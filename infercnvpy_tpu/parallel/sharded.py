"""Cell-sharded infercnv pipeline via jit + NamedSharding.

The jitted transform from :mod:`infercnvpy_tpu.ops.infercnv_kernel` is pure
data-parallel over cells except for the chunk-scoped noise std, which XLA
turns into a scatter-add + all-reduce across the mesh — the TPU analogue of
the reference's vstack-gather (reference: tl/_infercnv.py:137).
"""

from __future__ import annotations

import jax
import numpy as np

from ..genome.plan import WindowPlan
from ..ops.infercnv_kernel import build_infercnv_fn
from .mesh import cell_mesh, replicate, shard_cells

__all__ = ["sharded_infercnv_fn", "run_sharded_infercnv"]


def sharded_infercnv_fn(
    plan: WindowPlan,
    mesh=None,
    *,
    n_ref_rows: int,
    lfc_clip: float = 3.0,
    dynamic_threshold: float | None = 1.5,
    num_chunks: int = 1,
    calculate_gene_values: bool = False,
    dtype=None,
):
    """Build the infercnv transform with cell-axis in/out shardings attached."""
    import jax.numpy as jnp

    if mesh is None:
        mesh = cell_mesh()
    if dtype is None:
        dtype = jnp.float32

    base = build_infercnv_fn(
        plan,
        n_ref_rows=n_ref_rows,
        lfc_clip=lfc_clip,
        dynamic_threshold=dynamic_threshold,
        num_chunks=num_chunks,
        calculate_gene_values=calculate_gene_values,
        dtype=dtype,
    )
    data = shard_cells(mesh)
    repl = replicate(mesh)
    out_shardings = (data, data if calculate_gene_values else None)
    return jax.jit(base, in_shardings=(data, repl, data), out_shardings=out_shardings)


def run_sharded_infercnv(fn, mesh, x: np.ndarray, ref: np.ndarray, chunk_ids: np.ndarray, n_devices=None):
    """Pad the cell axis to the mesh size and run the sharded transform."""
    n_dev = n_devices or mesh.devices.size
    n = x.shape[0]
    pad = (-n) % n_dev
    if pad:
        x = np.concatenate([x, np.zeros((pad, x.shape[1]), x.dtype)], axis=0)
        chunk_ids = np.concatenate([chunk_ids, np.full(pad, chunk_ids.max() + 1, chunk_ids.dtype)])
    x_res, gene_res = fn(x, ref, chunk_ids)
    x_res = np.asarray(x_res)[:n]
    gene_res = None if gene_res is None else np.asarray(gene_res)[:n]
    return x_res, gene_res
