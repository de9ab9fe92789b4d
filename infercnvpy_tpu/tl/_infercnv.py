"""`tl.infercnv` — the primary CNV-inference entry point.

API and numerics contract follow the reference driver
(reference: tl/_infercnv.py:18-161), but the execution model is TPU-native:

* no process fan-out — ONE jitted XLA program processes a whole device batch
  of cells (reference forks ``cpu_count()`` workers, :120-135);
* the reference's chunk-scoped noise std (:448-453) is reproduced exactly via
  a segmented reduction keyed on ``floor(cell_index / chunksize)``, so results
  are independent of device batching;
* sparse inputs are densified host-side in row batches and streamed to the
  device (reference densifies per chunk inside each worker).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import scipy.sparse as sp

from .._util import _ensure_array, warn
from ..genome.plan import build_window_plan
from ..ops.infercnv_kernel import _pack_lut, build_infercnv_fn, pack_columns, pack_csr, packed_width

__all__ = ["infercnv"]


def infercnv(
    adata,
    *,
    reference_key: str | None = None,
    reference_cat: None | str | Sequence[str] = None,
    reference: np.ndarray | None = None,
    lfc_clip: float = 3,
    window_size: int = 100,
    step: int = 10,
    dynamic_threshold: float | None = 1.5,
    exclude_chromosomes: Sequence[str] | None = ("chrX", "chrY"),
    chunksize: int = 5000,
    n_jobs: int | None = None,
    inplace: bool = True,
    layer: str | None = None,
    key_added: str = "cnv",
    calculate_gene_values: bool = False,
    batch_cells: int | None = None,
    dtype=None,
    mesh=None,
):
    """Infer Copy Number Variation (CNV) by averaging gene expression over genomic regions.

    Parameters mirror the reference (reference: tl/_infercnv.py:18-96).
    ``n_jobs`` is accepted for API compatibility but ignored (no process pool —
    the TPU pipeline is a single compiled program).  Additional parameters:

    batch_cells
        Number of cells per device batch.  ``None`` picks a multiple of
        ``chunksize`` targeting a few GB of HBM.  Does not affect numerics.
    dtype
        Compute dtype.  ``None`` uses float64 when the (densified) input is
        float64/int (matching numpy promotion in the reference), else float32.
    mesh
        Device placement.  ``None`` (default) uses ALL local devices: with
        more than one, each device batch is shard_map-ed over a 1-D cell mesh
        (chunk noise statistics are psum-ed, so results are independent of
        the device count).  Pass a 1-D ``jax.sharding.Mesh`` to control
        placement, or ``False`` to force single-device execution.
    """
    del n_jobs
    if adata.shape[0] == 0:
        raise ValueError("adata contains no cells — nothing to infer CNV from.")
    if not adata.var_names.is_unique:
        raise ValueError("Ensure your var_names are unique!")
    if {"chromosome", "start", "end"} - set(adata.var.columns) != set():
        raise ValueError(
            "Genomic positions not found. There need to be `chromosome`, `start`, and `end` columns in `adata.var`. "
        )

    var_mask = adata.var["chromosome"].isnull()
    if np.sum(var_mask):
        warn(f"Skipped {np.sum(var_mask)} genes because they don't have a genomic position annotated. ")
    if exclude_chromosomes is not None:
        var_mask = var_mask | adata.var["chromosome"].isin(exclude_chromosomes)
    keep = ~var_mask.values

    reference = _get_reference(adata, reference_key, reference_cat, reference, layer)[:, keep]

    tmp_adata = adata[:, keep]
    expr = tmp_adata.X if layer is None else tmp_adata.layers[layer]
    if sp.issparse(expr):
        expr = expr.tocsr()
    var = tmp_adata.var.loc[:, ["chromosome", "start", "end"]]

    chr_pos, res, per_gene_mtx = _infercnv_compute(
        expr,
        var,
        np.asarray(reference, dtype=np.float64),
        lfc_clip=lfc_clip,
        window_size=window_size,
        step=step,
        dynamic_threshold=dynamic_threshold,
        chunksize=chunksize,
        calculate_gene_values=calculate_gene_values,
        batch_cells=batch_cells,
        dtype=dtype,
        mesh=mesh,
    )

    if calculate_gene_values:
        # reindex used-gene values to the FULL original var axis, NaN elsewhere
        # (reference: tl/_infercnv.py:141-149)
        per_gene_df = pd.DataFrame(per_gene_mtx, index=adata.obs.index, columns=var.index)
        per_gene_df = per_gene_df.reindex(columns=adata.var_names, fill_value=np.nan)
        per_gene_mtx = per_gene_df.values
    else:
        per_gene_mtx = None

    if inplace:
        adata.obsm[f"X_{key_added}"] = res
        adata.uns[key_added] = {"chr_pos": chr_pos}
        if calculate_gene_values:
            adata.layers[f"gene_values_{key_added}"] = per_gene_mtx
        return None
    return chr_pos, res, per_gene_mtx


def _pick_dtype(expr, dtype):
    import jax.numpy as jnp

    if dtype is not None:
        return jnp.dtype(dtype) if not isinstance(dtype, str) else jnp.dtype(dtype)
    kind = expr.dtype.kind
    if kind in "iu" or expr.dtype == np.float64:
        # float64 math matches the reference's numpy promotion
        import jax

        if jax.config.read("jax_enable_x64"):
            return jnp.float64
        warn(
            f"Input dtype {expr.dtype} implies float64 math (the reference's numpy "
            "promotion), but jax x64 is disabled — computing in float32. "
            'Enable with jax.config.update("jax_enable_x64", True) or pass dtype= explicitly.'
        )
    return jnp.float32


#: execution details of the most recent `_infercnv_compute` call (test hook):
#: {"n_devices": int, "sharded": bool}
_LAST_RUN_INFO: dict = {}


def _infercnv_compute(
    expr,
    var: pd.DataFrame,
    reference: np.ndarray,
    *,
    lfc_clip: float,
    window_size: int,
    step: int,
    dynamic_threshold: float | None,
    chunksize: int,
    calculate_gene_values: bool,
    batch_cells: int | None,
    dtype,
    mesh=None,
):
    """Run the full pipeline; returns (chr_pos, csr result, used-gene matrix or None)."""
    import jax

    n_cells, n_genes = expr.shape
    if n_cells == 0:
        raise ValueError("adata contains no cells — nothing to infer CNV from.")
    plan = build_window_plan(var, window_size, step)
    if plan.n_windows == 0:
        raise ValueError("No usable chromosomes found (need `chr*` prefixed chromosome annotations).")

    cdtype = _pick_dtype(expr, dtype)
    num_chunks = max(1, -(-n_cells // chunksize))

    if batch_cells is None:
        # target ≈1.5 GB of dense input per batch, rounded to whole chunks
        target = max(1, int(1.5e9 / max(1, n_genes * 4)))
        batch_cells = max(chunksize, (target // chunksize) * chunksize)
    else:
        batch_cells = max(chunksize, (batch_cells // chunksize) * chunksize)
    batch_cells = min(batch_cells, ((n_cells + chunksize - 1) // chunksize) * chunksize)

    # every local device participates by default: shard each device batch
    # over a 1-D cell mesh (the TPU analogue of the reference's process pool,
    # reference: tl/_infercnv.py:120-135)
    use_mesh = mesh is not False and (mesh is not None or len(jax.devices()) > 1)
    n_dev = 1
    if use_mesh:
        from ..parallel.mesh import cell_mesh, replicate, shard_cells
        from ..parallel.sharded import sharded_infercnv_fn

        the_mesh = mesh if mesh is not None else cell_mesh()
        n_dev = int(the_mesh.devices.size)
        fn = sharded_infercnv_fn(
            plan,
            the_mesh,
            n_ref_rows=reference.shape[0],
            lfc_clip=lfc_clip,
            dynamic_threshold=dynamic_threshold,
            num_chunks=num_chunks,
            calculate_gene_values=calculate_gene_values,
            dtype=cdtype,
        )
        data_sh, repl_sh = shard_cells(the_mesh), replicate(the_mesh)
    else:
        fn = build_infercnv_fn(
            plan,
            n_ref_rows=reference.shape[0],
            lfc_clip=lfc_clip,
            dynamic_threshold=dynamic_threshold,
            num_chunks=num_chunks,
            calculate_gene_values=calculate_gene_values,
            dtype=cdtype,
        )
    _LAST_RUN_INFO.clear()
    _LAST_RUN_INFO.update({"n_devices": n_dev, "sharded": use_mesh})

    # host-side packing: genes land in the plan's packed layout during
    # densification, so the device never pays for the permutation gather
    lut = _pack_lut(plan, n_genes)
    ref_dev = pack_columns(np.asarray(reference, dtype=cdtype), plan, lut)
    if use_mesh:
        ref_dev = jax.device_put(ref_dev, repl_sh)
    res_parts = []
    gene_parts = [] if calculate_gene_values else None

    def _materialize(pending):
        x_res, gene_res, rows = pending
        res_parts.append(sp.csr_matrix(np.asarray(x_res)[:rows]))
        if calculate_gene_values:
            gene_parts.append(np.asarray(gene_res)[:rows])

    # software pipeline: while the device computes batch k, the host packs
    # batch k+1 and drains batch k-1 (async device->host copy) — packing,
    # transfers, and compute all overlap (the TPU analogue of the reference's
    # worker pool keeping all cores busy, reference: tl/_infercnv.py:120-137)
    pending = None
    for start in range(0, n_cells, batch_cells):
        stop = min(start + batch_cells, n_cells)
        raw = expr[start:stop]
        if sp.issparse(raw):
            block = pack_csr(raw, plan, lut, dtype=cdtype)
        else:
            block = pack_columns(_ensure_array(np.asarray(raw)), plan, lut, dtype=cdtype)
        rows = stop - start
        pad = batch_cells - rows if (n_cells > batch_cells) else 0
        # the cell axis must split evenly over the mesh
        pad += (-(rows + pad)) % n_dev
        if pad:
            block = np.vstack([block, np.zeros((pad, packed_width(plan)), dtype=block.dtype)])
        chunk_ids = (start + np.arange(block.shape[0])) // chunksize
        if pad:
            chunk_ids[rows:] = num_chunks
        chunk_ids = chunk_ids.astype(np.int32)
        if use_mesh:
            block = jax.device_put(block, data_sh)
            chunk_ids = jax.device_put(chunk_ids, data_sh)
        x_res, gene_res = fn(block, ref_dev, chunk_ids)  # async dispatch
        for arr in (x_res, gene_res):
            if arr is not None and hasattr(arr, "copy_to_host_async"):
                arr.copy_to_host_async()
        if pending is not None:
            _materialize(pending)
        pending = (x_res, gene_res, rows)
    _materialize(pending)

    res = sp.vstack(res_parts) if len(res_parts) > 1 else res_parts[0]
    per_gene = None
    if calculate_gene_values:
        used = np.concatenate(gene_parts, axis=0) if len(gene_parts) > 1 else gene_parts[0]
        # device gene columns are in coverage-group-sorted order; scatter them
        # back to the masked var axis (uncovered genes stay NaN, matching the
        # reference's reindex, reference: tl/_infercnv.py:141-149)
        from ..ops.pallas_gene import gene_projection_data

        covered_sorted = gene_projection_data(plan).covered_sorted
        per_gene = np.full((n_cells, var.shape[0]), np.nan, dtype=used.dtype)
        per_gene[:, plan.used_genes[covered_sorted]] = used
    return plan.chr_pos, res, per_gene


def _get_reference(
    adata,
    reference_key: str | None,
    reference_cat,
    reference: np.ndarray | None,
    layer: str | None,
) -> np.ndarray:
    """Reference-baseline extraction (behavior matches reference tl/_infercnv.py:359-408)."""
    if layer is not None:
        X = adata.layers[layer]
    else:
        X = adata.X

    if reference is None:
        if reference_key is None or reference_cat is None:
            warn(
                "No reference given — falling back to the mean over ALL cells as the baseline; "
                "pass `reference` or `reference_key`+`reference_cat` for meaningful CNV calls."
            )
            reference = _mean0(X)
        else:
            obs_col = adata.obs[reference_key]
            if isinstance(reference_cat, str):
                reference_cat = [reference_cat]
            reference_cat = np.array(reference_cat)
            reference_cat_in_obs = np.isin(reference_cat, obs_col)
            if not np.all(reference_cat_in_obs):
                raise ValueError(
                    f"Categories {reference_cat[~reference_cat_in_obs]} do not occur "
                    f"in `adata.obs[{reference_key!r}]`."
                )
            reference = np.vstack([_mean0(X[np.asarray(obs_col.values == cat), :]) for cat in reference_cat])

    reference = np.asarray(reference)
    if reference.ndim == 1:
        reference = reference[np.newaxis, :]
    if reference.shape[1] != adata.shape[1]:
        raise ValueError("The reference baseline has a different gene count than `adata`.")
    return reference


def _mean0(X) -> np.ndarray:
    """Column means as a 1-D float64 array for dense or sparse input."""
    if sp.issparse(X):
        return np.asarray(X.mean(axis=0)).ravel()
    return np.asarray(np.mean(np.asarray(X), axis=0)).ravel()
