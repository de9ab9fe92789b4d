"""Mesh-aware downstream analysis: distributed cnv_score / PCA / kNN.

BASELINE configs 4-5 call for "all-reduce cnv_score + distributed PCA/kNN"
at 500k-1M cells (SURVEY §2.4, §7 step 6).  These tests pin device-count
independence on the virtual 8-device CPU mesh: the sharded paths must
reproduce the single-device results.
"""

import numpy as np
import numpy.testing as npt
import pytest

import jax

from infercnvpy_tpu.ops.knn import exact_knn
from infercnvpy_tpu.ops.linalg import truncated_svd
from infercnvpy_tpu.parallel.mesh import cell_mesh


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh from conftest")
    return cell_mesh(devs[:8])


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    # deliberately NOT a multiple of 8: exercises padding on every path
    return rng.normal(size=(203, 40)).astype(np.float32)


def test_truncated_svd_mesh_matches_single(data, mesh8):
    s1, c1, v1 = truncated_svd(data, 10)
    s8, c8, v8 = truncated_svd(data, 10, mesh=mesh8)
    npt.assert_allclose(v8, v1, rtol=1e-10)
    npt.assert_allclose(c8, c1, rtol=1e-8, atol=1e-10)
    npt.assert_allclose(s8, s1, rtol=1e-8, atol=1e-8)


def test_truncated_svd_mesh_zero_center(data, mesh8):
    s1, c1, v1 = truncated_svd(data, 5, zero_center=True)
    s8, c8, v8 = truncated_svd(data, 5, zero_center=True, mesh=mesh8)
    npt.assert_allclose(v8, v1, rtol=1e-10)
    npt.assert_allclose(s8, s1, rtol=1e-8, atol=1e-8)


def test_truncated_svd_mesh_blocked(data, mesh8):
    """Row blocks smaller than the input: multi-batch Gram accumulation."""
    s1, _, v1 = truncated_svd(data, 5)
    s8, _, v8 = truncated_svd(data, 5, mesh=mesh8, block_rows=64)
    npt.assert_allclose(v8, v1, rtol=1e-10)
    npt.assert_allclose(s8, s1, rtol=1e-8, atol=1e-8)


def test_exact_knn_mesh_matches_single(data, mesh8):
    d1, i1 = exact_knn(data, 10, block=64)
    d8, i8 = exact_knn(data, 10, block=64, mesh=mesh8)
    npt.assert_array_equal(i8, i1)
    npt.assert_allclose(d8, d1, rtol=1e-6, atol=1e-6)
    # self is the first neighbor everywhere
    npt.assert_array_equal(i8[:, 0], np.arange(data.shape[0]))


def test_cnv_score_mesh_matches_host(mesh8):
    from infercnvpy_tpu.datasets import synthetic_cnv_dataset
    from infercnvpy_tpu import tl

    adata = synthetic_cnv_dataset(n_cells=93, n_genes=300, seed=11)
    tl.infercnv(adata, reference_key="cell_type",
                reference_cat=["Microglia/Macrophage", "Oligodendrocytes (non-malignant)"])
    adata.obs["grp"] = [f"g{i % 5}" for i in range(adata.shape[0])]
    host = tl.cnv_score(adata, groupby="grp", inplace=False)
    sharded = tl.cnv_score(adata, groupby="grp", inplace=False, mesh=mesh8)
    assert set(host) == set(sharded)
    for g in host:
        npt.assert_allclose(sharded[g], host[g], rtol=1e-5)
    # inplace broadcast uses the sharded scores
    tl.cnv_score(adata, groupby="grp", mesh=mesh8)
    got = adata.obs["cnv_score"].to_numpy()
    want = np.array([host[g] for g in adata.obs["grp"]])
    npt.assert_allclose(got, want, rtol=1e-5)


def test_cnv_score_mesh_blocked(mesh8):
    """block_rows smaller than n_cells: multi-batch segment accumulation."""
    from infercnvpy_tpu.tl._scores import _group_abs_mean_sharded

    rng = np.random.default_rng(3)
    X = rng.normal(size=(77, 12)).astype(np.float32)
    codes = rng.integers(0, 4, size=77).astype(np.int32)
    got = _group_abs_mean_sharded(X, codes, 4, mesh8, block_rows=16)
    want = np.array([np.abs(X[codes == g]).mean() for g in range(4)])
    npt.assert_allclose(got, want, rtol=1e-5)


def test_ith_scores_mesh_match_host(mesh8):
    """ithcna/ithgex on the mesh reproduce the host np.corrcoef path."""
    from infercnvpy_tpu.datasets import synthetic_cnv_dataset
    from infercnvpy_tpu import tl

    adata = synthetic_cnv_dataset(n_cells=70, n_genes=120, seed=9)
    tl.infercnv(adata, reference_key="cell_type",
                reference_cat=["Microglia/Macrophage", "Oligodendrocytes (non-malignant)"])
    adata.obs["grp"] = [f"g{i % 3}" for i in range(adata.shape[0])]
    host_cna = tl.ithcna(adata, "grp", inplace=False)
    mesh_cna = tl.ithcna(adata, "grp", inplace=False, mesh=mesh8)
    host_gex = tl.ithgex(adata, "grp", inplace=False)
    mesh_gex = tl.ithgex(adata, "grp", inplace=False, mesh=mesh8)
    for h, m in ((host_cna, mesh_cna), (host_gex, mesh_gex)):
        assert set(h) == set(m)
        for g in h:
            npt.assert_allclose(m[g], h[g], rtol=1e-9, atol=1e-12)


def test_pearson_rows_mesh_matches_numpy(mesh8):
    from infercnvpy_tpu.ops.corr import pearson_rows

    rng = np.random.default_rng(4)
    X = rng.normal(size=(37, 25))
    want = np.corrcoef(X, rowvar=True)
    got = np.asarray(pearson_rows(X, mesh=mesh8))
    npt.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_pca_neighbors_mesh_passthrough(mesh8):
    """tl.pca / pp.neighbors forward mesh= to the sharded ops."""
    from infercnvpy_tpu.datasets import synthetic_cnv_dataset
    from infercnvpy_tpu import pp, tl

    adata = synthetic_cnv_dataset(n_cells=60, n_genes=300, seed=2)
    tl.infercnv(adata, reference_key="cell_type",
                reference_cat=["Microglia/Macrophage", "Oligodendrocytes (non-malignant)"])
    a1 = adata.copy()
    a8 = adata.copy()
    tl.pca(a1)
    pp.neighbors(a1)
    tl.pca(a8, mesh=mesh8)
    pp.neighbors(a8, mesh=mesh8)
    npt.assert_allclose(a8.obsm["X_cnv_pca"], a1.obsm["X_cnv_pca"], rtol=1e-7, atol=1e-8)
    d1 = a1.obsp["cnv_neighbors_distances"].toarray()
    d8 = a8.obsp["cnv_neighbors_distances"].toarray()
    npt.assert_allclose(d8, d1, rtol=1e-5, atol=1e-6)
