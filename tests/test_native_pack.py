"""Native C++ packer (native/pack.cpp) vs the pure-numpy fallback.

The packers densify expression blocks straight into the phase-major packed
layout consumed by the fused kernel (the host half of the pipeline the
reference runs per worker chunk, reference: tl/_infercnv.py:115-137).
"""

import numpy as np
import pytest
import scipy.sparse as sp

from infercnvpy_tpu.genome import build_window_plan
from infercnvpy_tpu.native import native_pack_available, native_pack_csr, native_pack_dense
from infercnvpy_tpu.ops.infercnv_kernel import _pack_lut, pack_columns, pack_csr, packed_width


def _plan(n_genes=500, seed=0):
    rng = np.random.default_rng(seed)
    import pandas as pd

    chrs = rng.choice([f"chr{i}" for i in range(1, 6)], size=n_genes)
    var = pd.DataFrame(
        {
            "chromosome": chrs,
            "start": rng.integers(0, 10_000_000, size=n_genes),
        }
    )
    var["end"] = var["start"] + 100
    return build_window_plan(var, window_size=25, step=5)


def _numpy_pack_csr(x, plan, lut):
    new_cols = lut[x.indices]
    keep = new_cols >= 0
    rows = np.repeat(np.arange(x.shape[0]), np.diff(x.indptr))[keep]
    out = np.zeros((x.shape[0], packed_width(plan)), dtype=np.float32)
    out[rows, new_cols[keep]] = x.data[keep]
    return out


@pytest.mark.skipif(not native_pack_available(), reason="native pack lib unavailable")
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_native_pack_csr_matches_numpy(dtype):
    plan = _plan()
    n_genes = int(plan.gene_mask.sum()) if hasattr(plan, "gene_mask") else 500
    rng = np.random.default_rng(1)
    x = sp.random(64, 500, density=0.1, format="csr", dtype=np.float32, random_state=2)
    lut = _pack_lut(plan, 500)
    got = native_pack_csr(x.indptr, x.indices, x.data, lut, packed_width(plan), dtype)
    want = _numpy_pack_csr(x, plan, lut).astype(dtype)
    assert got.dtype == np.dtype(dtype)
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not native_pack_available(), reason="native pack lib unavailable")
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_native_pack_dense_matches_numpy(dtype):
    plan = _plan(seed=3)
    rng = np.random.default_rng(4)
    x = rng.normal(size=(32, 500)).astype(np.float32)
    lut = _pack_lut(plan, 500)
    got = native_pack_dense(x, lut, packed_width(plan), dtype)
    out = np.zeros((32, packed_width(plan)), dtype=dtype)
    used = lut >= 0
    out[:, lut[used]] = x[:, used].astype(dtype)
    assert got.dtype == np.dtype(dtype)
    np.testing.assert_array_equal(got, out)


@pytest.mark.skipif(not native_pack_available(), reason="native pack lib unavailable")
def test_native_pack_rejects_out_of_bounds():
    """The C scatter is unchecked — the wrappers must validate lut bounds
    instead of corrupting the heap (ADVICE r3)."""
    plan = _plan(seed=9)
    w = packed_width(plan)
    lut = _pack_lut(plan, 500)
    x = sp.random(8, 500, density=0.1, format="csr", dtype=np.float32, random_state=10)
    # column index beyond the lut
    bad = x.copy()
    bad.indices = bad.indices.copy()
    if len(bad.indices):
        bad.indices[0] = 600
    with pytest.raises(IndexError, match="out of range"):
        native_pack_csr(bad.indptr, bad.indices, bad.data, lut, w, np.float32)
    # lut pointing past the output width
    bad_lut = lut.copy()
    bad_lut[0] = w + 5
    with pytest.raises(IndexError, match="out_width"):
        native_pack_csr(x.indptr, x.indices, x.data, bad_lut, w, np.float32)
    with pytest.raises(IndexError, match="out_width"):
        native_pack_dense(np.zeros((4, 500), np.float32), bad_lut, w, np.float32)
    with pytest.raises(IndexError, match="shorter"):
        native_pack_dense(np.zeros((4, 500), np.float32), lut[:100], w, np.float32)


@pytest.mark.parametrize("fmt", ["csr", "csc"])
def test_pack_csr_wrapper_dtype(fmt):
    # public wrapper honours the dtype arg on both native and fallback paths
    plan = _plan(seed=5)
    x = sp.random(16, 500, density=0.2, format=fmt, dtype=np.float64, random_state=6)
    out = pack_csr(x, plan, dtype=np.float32)
    assert out.dtype == np.float32
    assert out.shape == (16, packed_width(plan))
    # values survive the remap: total mass of kept genes matches
    lut = _pack_lut(plan, 500)
    xd = np.asarray(x.todense())
    used = lut >= 0
    np.testing.assert_allclose(out.sum(), xd[:, used].sum(), rtol=1e-5)


def test_pack_columns_wrapper_dtype():
    plan = _plan(seed=7)
    rng = np.random.default_rng(8)
    x = rng.normal(size=(8, 500)).astype(np.float64)
    out = pack_columns(x, plan, dtype=np.float32)
    assert out.dtype == np.float32
    lut = _pack_lut(plan, 500)
    used = lut >= 0
    np.testing.assert_allclose(
        np.sort(out[:, np.sort(lut[used])], axis=1),
        np.sort(x[:, used].astype(np.float32), axis=1),
        rtol=1e-6,
    )
