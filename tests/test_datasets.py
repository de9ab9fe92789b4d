"""Dataset generator / loader tests."""

import numpy as np
import pytest
import scipy.sparse as sp

import infercnvpy_tpu as cnv


def test_synthetic_deterministic():
    a = cnv.datasets.synthetic_cnv_dataset(n_cells=50, n_genes=300, seed=7)
    b = cnv.datasets.synthetic_cnv_dataset(n_cells=50, n_genes=300, seed=7)
    np.testing.assert_array_equal(a.X.toarray(), b.X.toarray())
    assert list(a.obs["cell_type"]) == list(b.obs["cell_type"])


def test_synthetic_has_genomic_annotations():
    a = cnv.datasets.synthetic_cnv_dataset(n_cells=20, n_genes=200, seed=0)
    assert {"chromosome", "start", "end"} <= set(a.var.columns)
    assert all(a.var["chromosome"].str.startswith("chr"))
    # starts sorted within each chromosome
    for c, grp in a.var.groupby("chromosome", observed=True):
        assert (np.diff(grp["start"].values) >= 0).all()


def test_oligodendroglioma_shape_and_types():
    a = cnv.datasets.oligodendroglioma()
    assert a.shape[0] == 183
    assert sp.issparse(a.X)
    assert {"Malignant", "Microglia/Macrophage", "Oligodendrocytes (non-malignant)"} <= set(
        a.obs["cell_type"].cat.categories
    )


def test_oligodendroglioma_cached(tmp_path, monkeypatch):
    from infercnvpy_tpu import settings

    monkeypatch.setattr(settings, "datasetdir", tmp_path)
    a = cnv.datasets.oligodendroglioma()
    assert (tmp_path / "oligodendroglioma_synthetic.h5ad").exists()
    b = cnv.datasets.oligodendroglioma()  # second call: loads from cache
    np.testing.assert_allclose(a.X.toarray(), b.X.toarray(), rtol=1e-6)


def test_maynard_synthetic_fallback(tmp_path, monkeypatch):
    from infercnvpy_tpu import settings

    monkeypatch.setattr(settings, "datasetdir", tmp_path / "nonexistent")
    # no network in tests: the downloader must fail fast and the synthetic
    # fallback must engage only when explicitly allowed
    import urllib.request

    def boom(*a, **k):
        raise OSError("no network")

    monkeypatch.setattr(urllib.request, "urlretrieve", boom)
    with pytest.raises(RuntimeError):
        cnv.datasets.maynard2020_3k()
    a = cnv.datasets.maynard2020_3k(allow_synthetic=True)
    assert a.shape[0] == 3000
