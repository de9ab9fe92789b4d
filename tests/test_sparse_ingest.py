"""Device-side CSR densification (ops/sparse_ingest.py).

The sparse-ingest path must produce bit-identical results to the host packer:
the scatter-add writes each (row, packed column) exactly once, so the
densified block — and everything downstream — is the same array.
(Replaces the reference's host-side densify, reference: tl/_infercnv.py:115-137.)
"""

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest
import scipy.sparse as sp

import infercnvpy_tpu as cnv
from infercnvpy_tpu.genome import build_window_plan
from infercnvpy_tpu.ops.infercnv_kernel import _pack_lut, pack_csr, packed_width
from infercnvpy_tpu.ops.sparse_ingest import (
    build_sparse_infercnv_fn,
    col_index_dtype,
    coo_from_csr_batch,
    round_nnz_cap,
)


def _plan(n_genes=400, seed=0):
    rng = np.random.default_rng(seed)
    chrs = rng.choice([f"chr{i}" for i in range(1, 5)], size=n_genes)
    var = pd.DataFrame({"chromosome": chrs, "start": rng.integers(0, 10_000_000, size=n_genes)})
    var["end"] = var["start"] + 100
    return var, build_window_plan(var, window_size=25, step=5)


def test_coo_from_csr_batch_roundtrip():
    var, plan = _plan()
    width = packed_width(plan)
    lut = _pack_lut(plan, 400)
    x = sp.random(32, 400, density=0.1, format="csr", dtype=np.float32, random_state=1)
    cols, vals, counts, nnz = coo_from_csr_batch(x, lut, width)
    assert cols.dtype == col_index_dtype(width)
    assert counts.sum() == nnz == len(cols) == len(vals)
    # scatter on host reproduces the packed dense block
    rows = np.repeat(np.arange(32), counts)
    dense = np.zeros((32, width), np.float32)
    dense[rows, cols.astype(np.int64)] = vals
    npt.assert_array_equal(dense, pack_csr(x, plan, lut, dtype=np.float32))


def test_coo_from_csr_batch_drops_unused_genes():
    var, plan = _plan(seed=3)
    width = packed_width(plan)
    lut = _pack_lut(plan, 400).copy()
    dropped = np.flatnonzero(lut >= 0)[:50]
    lut[dropped] = -1  # pretend 50 genes are unused
    x = sp.random(16, 400, density=0.3, format="csr", dtype=np.float32, random_state=2)
    cols, vals, counts, nnz = coo_from_csr_batch(x, lut, width)
    assert nnz == int((lut[x.indices] >= 0).sum())
    assert counts.sum() == nnz


def test_coo_padding_is_inert():
    var, plan = _plan(seed=4)
    width = packed_width(plan)
    lut = _pack_lut(plan, 400)
    x = sp.random(8, 400, density=0.05, format="csr", dtype=np.float32, random_state=5)
    cap = round_nnz_cap(x.nnz)
    cols, vals, counts, nnz = coo_from_csr_batch(x, lut, width, cap)
    assert len(cols) == cap and len(vals) == cap
    assert (cols[nnz:] == width - 1).all()
    assert (vals[nnz:] == 0).all()


def test_coo_cap_too_small_raises():
    var, plan = _plan(seed=6)
    lut = _pack_lut(plan, 400)
    x = sp.random(8, 400, density=0.5, format="csr", dtype=np.float32, random_state=7)
    with pytest.raises(ValueError, match="nnz_cap"):
        coo_from_csr_batch(x, lut, packed_width(plan), nnz_cap=4)


@pytest.mark.parametrize("gene_values", [False, True])
def test_sparse_fn_matches_dense_fn(gene_values):
    """build_sparse_infercnv_fn == host pack + build_infercnv_fn, bitwise."""
    import jax.numpy as jnp

    from infercnvpy_tpu.ops.infercnv_kernel import build_infercnv_fn, pack_columns

    var, plan = _plan(seed=8)
    width = packed_width(plan)
    lut = _pack_lut(plan, 400)
    rng = np.random.default_rng(9)
    x = sp.random(24, 400, density=0.15, format="csr", dtype=np.float32, random_state=10)
    ref = pack_columns(rng.normal(size=(2, 400)).astype(np.float32), plan, lut)
    cid = (np.arange(24) // 10).astype(np.int32)

    kwargs = dict(
        n_ref_rows=2,
        lfc_clip=3.0,
        dynamic_threshold=1.5,
        num_chunks=3,
        calculate_gene_values=gene_values,
        dtype=jnp.float32,
    )
    dense_fn = build_infercnv_fn(plan, **kwargs)
    block = pack_csr(x, plan, lut, dtype=np.float32)
    want, want_g = dense_fn(block, ref, cid)

    cap = round_nnz_cap(x.nnz)
    cols, vals, counts, _ = coo_from_csr_batch(x, lut, width, cap)
    sparse_fn = build_sparse_infercnv_fn(plan, n_rows=24, nnz_cap=cap, **kwargs)
    got, got_g = sparse_fn(cols, vals, counts, ref, cid)

    npt.assert_array_equal(np.asarray(got), np.asarray(want))
    if gene_values:
        got_g, want_g = np.asarray(got_g), np.asarray(want_g)
        npt.assert_array_equal(np.isnan(got_g), np.isnan(want_g))
        m = ~np.isnan(got_g)
        npt.assert_array_equal(got_g[m], want_g[m])


def _mk_adata(n_cells=60, n_genes=300, seed=11):
    rng = np.random.default_rng(seed)
    X = sp.random(n_cells, n_genes, density=0.2, format="csr", dtype=np.float32, random_state=seed)
    chrs = rng.choice(["chr1", "chr2", "chr3"], size=n_genes)
    var = pd.DataFrame(
        {
            "chromosome": chrs,
            "start": rng.integers(0, 5_000_000, size=n_genes),
        },
        index=[f"g{i}" for i in range(n_genes)],
    )
    var["end"] = var["start"] + 100
    obs = pd.DataFrame(
        {"cell_type": rng.choice(["a", "b"], size=n_cells)}, index=[f"c{i}" for i in range(n_cells)]
    )
    return cnv.AnnData(X=X, obs=obs, var=var)


@pytest.mark.parametrize("gene_values", [False, True])
def test_infercnv_device_densify_equivalence(gene_values):
    """Full driver: device_densify path == host-pack path on sparse input."""
    ad1 = _mk_adata()
    ad2 = _mk_adata()
    common = dict(
        reference_key="cell_type",
        reference_cat="a",
        window_size=20,
        step=4,
        chunksize=25,
        calculate_gene_values=gene_values,
        mesh=False,
        dtype="float32",
    )
    cnv.tl.infercnv(ad1, device_densify=True, **common)
    from infercnvpy_tpu.tl._infercnv import _LAST_RUN_INFO

    assert _LAST_RUN_INFO["device_densify"] is True
    cnv.tl.infercnv(ad2, device_densify=False, **common)
    assert _LAST_RUN_INFO["device_densify"] is False
    a = np.asarray(ad1.obsm["X_cnv"].todense())
    b = np.asarray(ad2.obsm["X_cnv"].todense())
    npt.assert_array_equal(a, b)
    if gene_values:
        ga = ad1.layers["gene_values_cnv"]
        gb = ad2.layers["gene_values_cnv"]
        npt.assert_array_equal(np.isnan(ga), np.isnan(gb))
        m = ~np.isnan(ga)
        npt.assert_array_equal(ga[m], gb[m])


def test_infercnv_device_densify_multi_batch_stats():
    """Batching + stats mode: multiple device batches, per-stage breakdown."""
    ad = _mk_adata(n_cells=90)
    from infercnvpy_tpu.tl._infercnv import _get_reference, _infercnv_compute

    ref = _get_reference(ad, "cell_type", ["a"], None, None)
    var = ad.var.loc[:, ["chromosome", "start", "end"]]
    stats: dict = {}
    chr_pos, res, _ = _infercnv_compute(
        ad.X.tocsr(),
        var,
        np.asarray(ref, dtype=np.float64),
        lfc_clip=3.0,
        window_size=20,
        step=4,
        dynamic_threshold=1.5,
        chunksize=25,
        calculate_gene_values=False,
        batch_cells=50,
        dtype="float32",
        mesh=False,
        stats=stats,
    )
    assert res.shape[0] == 90
    assert stats["mode"] == "device_densify"
    for k in ("host_pack_sec", "h2d_sec", "compute_sec", "d2h_sec", "csr_sec", "compile_sec"):
        assert k in stats and stats[k] >= 0
    assert stats["h2d_bytes"] > 0
    # equivalence with the unbatched host path
    stats2: dict = {}
    _, res2, _ = _infercnv_compute(
        ad.X.tocsr(),
        var,
        np.asarray(ref, dtype=np.float64),
        lfc_clip=3.0,
        window_size=20,
        step=4,
        dynamic_threshold=1.5,
        chunksize=25,
        calculate_gene_values=False,
        batch_cells=None,
        dtype="float32",
        mesh=False,
        device_densify=False,
        stats=stats2,
    )
    assert stats2["mode"] == "host_pack"
    npt.assert_array_equal(np.asarray(res.todense()), np.asarray(res2.todense()))
