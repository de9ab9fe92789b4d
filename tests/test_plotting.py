"""Plot smoke tests (reference: tests/test_plotting.py)."""

import matplotlib

matplotlib.use("Agg")

import pytest

import infercnvpy_tpu as cnv


def test_plot_chromosome_heatmap(adata_infercnv):
    axes = cnv.pl.chromosome_heatmap(adata_infercnv, show=False)
    assert "heatmap_ax" in axes


def test_plot_chromosome_heatmap_summary(adata_infercnv):
    axes = cnv.pl.chromosome_heatmap_summary(adata_infercnv, show=False)
    assert "heatmap_ax" in axes


def test_plot_heatmap_requires_leiden(adata_oligodendroma):
    cnv.tl.infercnv(adata_oligodendroma)
    with pytest.raises(ValueError):
        cnv.pl.chromosome_heatmap(adata_oligodendroma, show=False)


def test_plot_heatmap_groupby_celltype(adata_oligodendroma):
    cnv.tl.infercnv(adata_oligodendroma)
    axes = cnv.pl.chromosome_heatmap(adata_oligodendroma, groupby="cell_type", show=False)
    assert "heatmap_ax" in axes


def test_plot_heatmap_dendrogram_and_kwargs(adata_infercnv):
    """dendrogram= reorders groups; extra kwargs reach imshow (reference
    passes them through to sc.pl.heatmap, pl/_chromosome_heatmap.py:74-85)."""
    axes = cnv.pl.chromosome_heatmap(adata_infercnv, show=False, dendrogram=True, alpha=0.9)
    assert "heatmap_ax" in axes
    axes = cnv.pl.chromosome_heatmap_summary(adata_infercnv, show=False, dendrogram=True)
    assert "heatmap_ax" in axes


def test_plot_save(adata_infercnv, tmp_path):
    from infercnvpy_tpu import settings

    old = settings.figdir
    settings.figdir = tmp_path
    try:
        cnv.pl.chromosome_heatmap(adata_infercnv, show=False, save=".png")
        assert (tmp_path / "heatmap.png").exists()
    finally:
        settings.figdir = old
