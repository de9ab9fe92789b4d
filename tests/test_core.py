"""Tests for the standalone AnnData container + h5ad round-trip."""

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest
import scipy.sparse as sp

import infercnvpy_tpu as cnv
from infercnvpy_tpu.core import AnnData, read_h5ad


@pytest.fixture
def adata_small():
    X = np.arange(12, dtype=np.float32).reshape(3, 4)
    obs = pd.DataFrame({"group": pd.Categorical(["a", "b", "a"])}, index=["c1", "c2", "c3"])
    var = pd.DataFrame({"chromosome": ["chr1", "chr1", "chr2", None], "start": [1, 5, 2, 7]},
                       index=["g1", "g2", "g3", "g4"])
    a = AnnData(X=X, obs=obs, var=var)
    a.obsm["X_pca"] = np.ones((3, 2), np.float32)
    a.layers["raw"] = sp.csr_matrix(X)
    a.obsp["conn"] = sp.csr_matrix(np.eye(3))
    a.uns["meta"] = {"chr_pos": {"chr1": 0, "chr2": 2}, "note": "hello", "num": 3}
    return a


def test_shapes_and_names(adata_small):
    assert adata_small.shape == (3, 4)
    assert list(adata_small.obs_names) == ["c1", "c2", "c3"]
    assert list(adata_small.var_names) == ["g1", "g2", "g3", "g4"]


def test_subset_obs(adata_small):
    sub = adata_small[np.array([True, False, True]), :]
    assert sub.shape == (2, 4)
    assert list(sub.obs_names) == ["c1", "c3"]
    npt.assert_array_equal(sub.X, adata_small.X[[0, 2]])
    assert sub.obsm["X_pca"].shape == (2, 2)
    assert sub.obsp["conn"].shape == (2, 2)


def test_subset_var(adata_small):
    sub = adata_small[:, ["g2", "g3"]]
    assert sub.shape == (3, 2)
    npt.assert_array_equal(sub.X, adata_small.X[:, [1, 2]])
    assert sub.layers["raw"].shape == (3, 2)


def test_inplace_subset_obs(adata_small):
    adata_small._inplace_subset_obs(["c3", "c1"])
    assert list(adata_small.obs_names) == ["c3", "c1"]
    assert adata_small.X.shape == (2, 4)


def test_axis_validation(adata_small):
    with pytest.raises(ValueError):
        adata_small.obsm["bad"] = np.zeros((5, 2))
    with pytest.raises(ValueError):
        adata_small.obsp["bad"] = np.zeros((3, 4))


def test_h5ad_roundtrip(adata_small, tmp_path):
    path = tmp_path / "test.h5ad"
    adata_small.write_h5ad(path)
    back = read_h5ad(path)
    npt.assert_allclose(back.X, adata_small.X)
    assert list(back.obs_names) == list(adata_small.obs_names)
    assert list(back.var_names) == list(adata_small.var_names)
    assert list(back.obs["group"]) == list(adata_small.obs["group"])
    assert back.var["chromosome"].isna().iloc[3] or back.var["chromosome"].iloc[3] in ("", "None")
    npt.assert_allclose(np.asarray(back.layers["raw"].todense()), adata_small.X)
    npt.assert_allclose(back.obsm["X_pca"], adata_small.obsm["X_pca"])
    assert back.uns["meta"]["chr_pos"] == {"chr1": 0, "chr2": 2}
    assert back.uns["meta"]["note"] == "hello"
    assert back.uns["meta"]["num"] == 3


def test_h5ad_sparse_X(tmp_path):
    X = sp.random(20, 10, density=0.3, format="csr", random_state=0, dtype=np.float32)
    a = AnnData(X=X)
    path = tmp_path / "sparse.h5ad"
    a.write_h5ad(path)
    back = read_h5ad(path)
    assert sp.issparse(back.X) and back.X.format == "csr"
    npt.assert_allclose(back.X.toarray(), X.toarray())


def test_copy_independent(adata_small):
    cp = adata_small.copy()
    cp.X[0, 0] = 99
    assert adata_small.X[0, 0] != 99
    cp.obs["group"] = ["x", "x", "x"]
    assert list(adata_small.obs["group"]) == ["a", "b", "a"]


def test_raw_roundtrip(tmp_path):
    X = np.random.default_rng(0).random((5, 3)).astype(np.float32)
    a = AnnData(X=X.copy())
    a.raw = a
    a.X = X * 2
    npt.assert_allclose(a.raw.X, X)
    path = tmp_path / "raw.h5ad"
    a.write_h5ad(path)
    back = read_h5ad(path)
    npt.assert_allclose(back.raw.X, X)


def test_constructor_from_dataframe():
    df = pd.DataFrame(np.eye(3), index=["a", "b", "c"], columns=["x", "y", "z"])
    a = AnnData(df)
    assert list(a.obs_names) == ["a", "b", "c"]
    assert list(a.var_names) == ["x", "y", "z"]
