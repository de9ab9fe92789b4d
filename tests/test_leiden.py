"""Leiden clustering tests: native C++ and pure-Python implementations."""

import numpy as np
import pytest
import scipy.sparse as sp

from infercnvpy_tpu.native import native_available
from infercnvpy_tpu.ops.leiden import leiden


def _planted_partition(n_per=60, k=3, p_in=0.25, p_out=0.01, seed=0):
    rng = np.random.default_rng(seed)
    n = n_per * k
    truth = np.repeat(np.arange(k), n_per)
    rows, cols = [], []
    for i in range(n):
        for j in range(i + 1, n):
            p = p_in if truth[i] == truth[j] else p_out
            if rng.random() < p:
                rows += [i, j]
                cols += [j, i]
    A = sp.csr_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))
    return A, truth


def _ari(a, b):
    """Adjusted Rand index (own implementation, no sklearn dependency needed)."""
    from scipy.special import comb

    a = np.asarray(a)
    b = np.asarray(b)
    n = len(a)
    cats_a, inv_a = np.unique(a, return_inverse=True)
    cats_b, inv_b = np.unique(b, return_inverse=True)
    C = np.zeros((len(cats_a), len(cats_b)), dtype=np.int64)
    np.add.at(C, (inv_a, inv_b), 1)
    sum_comb_c = comb(C, 2).sum()
    sum_comb_a = comb(C.sum(axis=1), 2).sum()
    sum_comb_b = comb(C.sum(axis=0), 2).sum()
    expected = sum_comb_a * sum_comb_b / comb(n, 2)
    max_index = (sum_comb_a + sum_comb_b) / 2
    return (sum_comb_c - expected) / (max_index - expected)


@pytest.mark.parametrize("use_native", [False, True])
def test_leiden_planted_partition(use_native):
    if use_native and not native_available():
        pytest.skip("native leiden unavailable (no g++)")
    A, truth = _planted_partition()
    labels = leiden(A, use_native=use_native)
    assert _ari(truth, labels) > 0.95


@pytest.mark.parametrize("use_native", [False, True])
def test_leiden_deterministic(use_native):
    if use_native and not native_available():
        pytest.skip("native leiden unavailable")
    A, _ = _planted_partition(seed=3)
    l1 = leiden(A, seed=42, use_native=use_native)
    l2 = leiden(A, seed=42, use_native=use_native)
    np.testing.assert_array_equal(l1, l2)


def test_leiden_native_matches_python_partition():
    if not native_available():
        pytest.skip("native leiden unavailable")
    A, truth = _planted_partition(seed=1)
    ln = leiden(A, use_native=True)
    lp = leiden(A, use_native=False)
    assert _ari(ln, lp) > 0.95


def test_leiden_labels_ordered_by_size():
    A, _ = _planted_partition(n_per=40, k=2, seed=2)
    labels = leiden(A)
    _, counts = np.unique(labels, return_counts=True)
    assert (np.diff(counts) <= 0).all()


def test_leiden_resolution_monotone():
    A, _ = _planted_partition(seed=4)
    k_low = len(set(leiden(A, resolution=0.1)))
    k_high = len(set(leiden(A, resolution=3.0)))
    assert k_low <= k_high
