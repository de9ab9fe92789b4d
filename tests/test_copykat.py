"""copyKAT bridge marshaling tests (no R needed).

The R call itself cannot run here (no rpy2/R), but the Python halves of the
bridge — expression marshaling in and result storage out — are pure pandas
and are pinned against the reference's storage contract
(reference: tl/_copykat.py:106-125,158-177).
"""

import numpy as np
import pandas as pd
import pytest

import infercnvpy_tpu as cnv
from infercnvpy_tpu.tl._copykat import _store_copykat, _to_r_matrix_df


@pytest.fixture()
def adata_small():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(5, 7)).astype(np.float32)
    ad = cnv.AnnData(
        X=X,
        obs=pd.DataFrame(index=[f"cell{i}" for i in range(5)]),
        var=pd.DataFrame(index=[f"gene{j}" for j in range(7)]),
    )
    return ad


def _fake_cna(cells, n_windows=6):
    """CNAmat-shaped frame: windows x (chrom, chrompos, abspos, cells...)."""
    rng = np.random.default_rng(1)
    cna = pd.DataFrame(
        {
            "chrom": [1, 1, 1, 2, 2, 3][:n_windows],
            "chrompos": np.arange(n_windows) * 5_000_000,
            "abspos": np.arange(n_windows) * 5_000_000,
        }
    )
    for c in cells:
        cna[c] = rng.normal(size=n_windows)
    return cna


def test_to_r_matrix_df_is_genes_by_cells(adata_small):
    df = _to_r_matrix_df(adata_small.X, adata_small)
    assert list(df.index) == list(adata_small.var_names)
    assert list(df.columns) == list(adata_small.obs_names)
    np.testing.assert_allclose(df.values, np.asarray(adata_small.X).T)


def test_store_copykat_inplace(adata_small):
    cells = list(adata_small.obs_names)
    cna = _fake_cna(cells)
    pred = pd.DataFrame({"copykat.pred": ["aneuploid", "diploid", "diploid", "aneuploid", "diploid"]}, index=cells)
    out = _store_copykat(adata_small, cna, pred, "cnv", inplace=True)
    assert out is None
    # chr_pos: first CNA row of each chromosome (reference tl/_copykat.py:158-162)
    assert adata_small.uns["cnv"] == {"chr_pos": {"chr1": 0, "chr2": 3, "chr3": 5}}
    # matrix: cells x windows aligned to obs order (reference :165-171,175)
    want = cna[cells].T.values
    np.testing.assert_allclose(adata_small.obsm["X_cnv"], want)
    # prediction lands in obs[key_added], NOT a hardcoded column (reference :176)
    assert list(adata_small.obs["cnv"]) == ["aneuploid", "diploid", "diploid", "aneuploid", "diploid"]
    assert "cnv_status" not in adata_small.obs.columns


def test_store_copykat_missing_cells_get_nan(adata_small):
    """Cells copyKAT dropped must come back NaN via the left merge."""
    cells = list(adata_small.obs_names)
    cna = _fake_cna(cells)
    pred = pd.DataFrame({"copykat.pred": ["diploid", "aneuploid"]}, index=cells[:2])
    _store_copykat(adata_small, cna, pred, "ck", inplace=True)
    vals = adata_small.obs["ck"]
    assert list(vals[:2]) == ["diploid", "aneuploid"]
    assert vals[2:].isna().all()


def test_store_copykat_cell_names_column(adata_small):
    """A prediction frame carrying cell.names as a column (not the index) works too."""
    cells = list(adata_small.obs_names)
    cna = _fake_cna(cells)
    pred = pd.DataFrame({"cell.names": cells, "copykat.pred": ["d"] * 5})
    _store_copykat(adata_small, cna, pred, "cnv", inplace=True)
    assert list(adata_small.obs["cnv"]) == ["d"] * 5


def test_store_copykat_not_inplace(adata_small):
    """inplace=False returns (matrix, prediction) like the reference (reference :177)."""
    cells = list(adata_small.obs_names)
    cna = _fake_cna(cells)
    pred = pd.DataFrame({"copykat.pred": ["d"] * 5}, index=cells)
    mtx, pred_series = _store_copykat(adata_small, cna, pred, "cnv", inplace=False)
    assert mtx.shape == (5, 6)
    assert list(pred_series) == ["d"] * 5
    assert "X_cnv" not in adata_small.obsm


def test_copykat_requires_rpy2(adata_small):
    with pytest.raises(ImportError, match="rpy2"):
        cnv.tl.copykat(adata_small)
