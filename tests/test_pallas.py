"""Pallas kernel unit tests (run in interpreter mode on the CPU mesh)."""

import numpy as np
import numpy.testing as npt
import pytest

from infercnvpy_tpu.ops.pallas_select import row_kth_smallest, row_median


@pytest.mark.parametrize("shape", [(8, 9), (16, 1793), (8, 1794), (8, 2)])
def test_row_median_exact(shape):
    rng = np.random.default_rng(0)
    x = rng.normal(size=shape).astype(np.float32)
    x[0, :] = 0.0
    if shape[0] > 1:
        x[1, : shape[1] // 2] = -1.5
    got = np.asarray(row_median(x, row_tile=8))
    want = np.median(x, axis=1).astype(np.float32)
    npt.assert_array_equal(got, want)


def test_row_median_negatives_and_ties():
    x = np.array(
        [
            [-1.0, -1.0, -1.0, 5.0],
            [0.0, -0.0, 1.0, -1.0],
            [np.float32(1e-38), np.float32(-1e-38), 2.0, -2.0],
        ],
        dtype=np.float32,
    )
    got = np.asarray(row_median(x, row_tile=3))
    want = np.median(x, axis=1).astype(np.float32)
    npt.assert_array_equal(got, want)


def test_row_kth_smallest():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 33)).astype(np.float32)
    for k in [0, 16, 32]:
        got = np.asarray(row_kth_smallest(x, k, row_tile=8))
        want = np.sort(x, axis=1)[:, k]
        npt.assert_array_equal(got, want)
