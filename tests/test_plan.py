"""Window-plan unit tests: reproduce reference _running_mean behavior
(reference: tests/test_tools.py:64-117) through the plan + kernel path."""

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest

from infercnvpy_tpu.genome import build_window_plan, natural_sort
from infercnvpy_tpu.ops.infercnv_kernel import smooth_only_fn


def _plan_for(n_genes_per_chrom, window, step):
    rows = []
    for c, g in n_genes_per_chrom.items():
        for i in range(g):
            rows.append((c, (i + 1) * 100))
    var = pd.DataFrame(rows, columns=["chromosome", "start"])
    var["end"] = var["start"] + 10
    return var, build_window_plan(var, window, step)


def test_natural_sort():
    assert natural_sort(["chr11", "chr2", "chr1"]) == ["chr1", "chr2", "chr11"]
    assert natural_sort(["chrX", "chr10", "chr9"]) == ["chr9", "chr10", "chrX"]


def test_plan_basic():
    var, plan = _plan_for({"chr1": 5, "chr2": 5}, window=3, step=1)
    assert plan.chromosomes == ["chr1", "chr2"]
    assert plan.chr_pos == {"chr1": 0, "chr2": 3}
    assert plan.n_windows == 6


def test_plan_skips_non_chr_and_chrM():
    var, plan = _plan_for({"chr1": 5, "chrM": 4, "1": 6}, window=3, step=1)
    assert plan.chromosomes == ["chr1"]
    assert plan.n_windows == 3


def test_running_mean_pyramid():
    """Matches reference test_running_mean_n_less_than_genes (pyramid [1,2,1])."""
    var, plan = _plan_for({"chr1": 5}, window=3, step=1)
    x = np.array([[1, 2, 3, 4, 5], [6, 7, 8, 9, 10]], dtype=np.float64)
    out = np.asarray(smooth_only_fn(plan, dtype=np.float64)(x))
    npt.assert_allclose(out, np.array([[2, 3, 4], [7, 8, 9]], dtype=np.float64))


def test_running_mean_window_larger_than_genes():
    """Matches reference test_running_mean_n_greater_than_genes (uniform mean)."""
    var, plan = _plan_for({"chr1": 5}, window=7, step=1)
    x = np.array([[1, 2, 3, 4, 5], [6, 7, 8, 9, 10]], dtype=np.float64)
    out = np.asarray(smooth_only_fn(plan, dtype=np.float64)(x))
    npt.assert_allclose(out, np.array([[3.0], [8.0]]))


def test_step_subsampling():
    var, plan = _plan_for({"chr1": 25}, window=5, step=10)
    # reference: windows at offsets 0, 10, 20 -> but 20+5 > 25 -> only 0, 10
    # W = (25-5)//10 + 1 = 3 -> offsets 0,10,20; 20+5=25 <= 25 so 3 windows
    assert plan.n_windows == 3
    x = np.arange(25, dtype=np.float64)[None, :]
    out = np.asarray(smooth_only_fn(plan, dtype=np.float64)(x))
    r = np.arange(1, 6)
    pyr = np.minimum(r, r[::-1]).astype(float)
    pyr /= pyr.sum()
    expected = [np.dot(x[0, o : o + 5], pyr) for o in (0, 10, 20)]
    npt.assert_allclose(out[0], expected, rtol=1e-12)


def test_window_equals_genes_uses_uniform():
    """Reference branch condition is strict: n < G uses pyramid, n == G uniform."""
    var, plan = _plan_for({"chr1": 3}, window=3, step=1)
    assert plan.n_small == 1
    x = np.array([[1.0, 2.0, 6.0]])
    out = np.asarray(smooth_only_fn(plan, dtype=np.float64)(x))
    npt.assert_allclose(out, [[3.0]])


def test_mixed_regular_and_small_chromosomes():
    var, plan = _plan_for({"chr1": 6, "chr2": 2, "chr3": 8}, window=3, step=1)
    assert plan.chr_pos == {"chr1": 0, "chr2": 4, "chr3": 5}
    assert plan.n_windows == 4 + 1 + 6
    x = np.arange(16, dtype=np.float64)[None, :]
    out = np.asarray(smooth_only_fn(plan, dtype=np.float64)(x))
    # chr2 (cols 6,7) uniform mean
    npt.assert_allclose(out[0, 4], (6 + 7) / 2)
    # chr1 first pyramid window over cols 0,1,2
    npt.assert_allclose(out[0, 0], (0 * 1 + 1 * 2 + 2 * 1) / 4)
    # chr3 first pyramid window over cols 8,9,10
    npt.assert_allclose(out[0, 5], (8 * 1 + 9 * 2 + 10 * 1) / 4)


def test_gene_coverage_indices():
    var, plan = _plan_for({"chr1": 10}, window=4, step=3)
    # windows at ranks 0..3, 3..6, 6..9 -> W=3
    assert plan.n_windows == 3
    lo, hi = plan.gene_win_lo, plan.gene_win_hi
    # rank 0 covered only by window 0; rank 3 by windows 0 and 1; rank 9 by window 2
    assert (lo[0], hi[0]) == (0, 0)
    assert (lo[3], hi[3]) == (0, 1)
    assert (lo[9], hi[9]) == (2, 2)


def test_uncovered_trailing_genes():
    var, plan = _plan_for({"chr1": 12}, window=4, step=6)
    # W = (12-4)//6 + 1 = 2 -> windows at 0..3, 6..9; ranks 4,5,10,11 uncovered
    assert plan.n_windows == 2
    uncovered = np.flatnonzero(plan.gene_win_lo < 0)
    npt.assert_array_equal(uncovered, [4, 5, 10, 11])


@pytest.mark.parametrize("window,step", [(3, 1), (5, 2), (10, 10), (100, 10)])
def test_plan_matches_bruteforce(window, step):
    """Cross-check the packed conv against a direct numpy running mean."""
    rng = np.random.default_rng(42)
    sizes = {"chr1": 120, "chr2": 37, "chr3": 8, "chr10": 55}
    var, plan = _plan_for(sizes, window=window, step=step)
    x = rng.normal(size=(7, sum(sizes.values())))
    out = np.asarray(smooth_only_fn(plan, dtype=np.float64)(x))

    # brute force per chromosome in natural order
    expected_parts = []
    col = 0
    order = ["chr1", "chr2", "chr3", "chr10"]
    chrom_cols = {}
    for c in order:
        chrom_cols[c] = np.arange(col, col + sizes[c])
        col += sizes[c]
    for c in ["chr1", "chr2", "chr3", "chr10"]:
        xc = x[:, chrom_cols[c]]
        g = xc.shape[1]
        if window < g:
            r = np.arange(1, window + 1)
            pyr = np.minimum(r, r[::-1]).astype(float)
            conv = np.stack([np.convolve(row, pyr, mode="valid") for row in xc]) / pyr.sum()
            expected_parts.append(conv[:, ::step])
        else:
            expected_parts.append(xc.mean(axis=1, keepdims=True))
    expected = np.hstack(expected_parts)
    npt.assert_allclose(out, expected, rtol=1e-10, atol=1e-12)
