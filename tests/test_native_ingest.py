"""Native (C++/OpenMP) host-pipeline stages vs their numpy fallbacks.

With the software pipeline in place and a fast transfer link, the host-side
stages (CSR remap for the device densify; dense->CSR result assembly) are
the next wall — both have one-pass parallel native implementations in
native/pack.cpp that must stay bitwise-equal to the numpy paths.
"""

import numpy as np
import numpy.testing as npt
import pytest
import scipy.sparse as sp

from infercnvpy_tpu.native import native_coo_remap, native_dense_to_csr, native_pack_available

pytestmark = pytest.mark.skipif(not native_pack_available(), reason="native lib unavailable (no toolchain)")


def _numpy_remap(x, lut):
    new_cols = lut[x.indices]
    keep = new_cols >= 0
    rows_rep = np.repeat(np.arange(x.shape[0], dtype=np.int64), np.diff(x.indptr))
    counts = np.bincount(rows_rep[keep], minlength=x.shape[0]).astype(np.int32)
    return new_cols[keep], x.data[keep], counts


@pytest.mark.parametrize("col_dtype", [np.int16, np.uint16, np.int32])
@pytest.mark.parametrize("filtered", [False, True])
def test_coo_remap_matches_numpy(col_dtype, filtered):
    rng = np.random.default_rng(3)
    x = sp.random(70, 300, density=0.15, format="csr", dtype=np.float32, random_state=2)
    lut = np.arange(300, dtype=np.int64)
    if filtered:
        lut[rng.choice(300, size=90, replace=False)] = -1
    cap = 5000
    cols, vals, counts, nnz = native_coo_remap(x.indptr, x.indices, x.data, lut, cap, col_dtype, np.float32)
    want_cols, want_vals, want_counts = _numpy_remap(x, lut)
    assert nnz == len(want_cols)
    npt.assert_array_equal(counts, want_counts)
    npt.assert_array_equal(cols[:nnz], want_cols.astype(col_dtype))
    npt.assert_array_equal(vals[:nnz], want_vals)


def test_coo_remap_bf16_rounds_like_numpy():
    import ml_dtypes

    rng = np.random.default_rng(5)
    x = sp.random(40, 200, density=0.2, format="csr", dtype=np.float32, random_state=4)
    lut = np.arange(200, dtype=np.int64)
    bf = np.dtype(ml_dtypes.bfloat16)
    cols, vals, counts, nnz = native_coo_remap(x.indptr, x.indices, x.data, lut, 3000, np.int16, bf)
    want = x.data.astype(ml_dtypes.bfloat16)
    npt.assert_array_equal(vals[:nnz].view(np.uint16), want.view(np.uint16))


def test_coo_remap_cap_overflow_raises():
    x = sp.random(10, 50, density=0.5, format="csr", dtype=np.float32, random_state=0)
    lut = np.arange(50, dtype=np.int64)
    with pytest.raises(ValueError, match="too small"):
        native_coo_remap(x.indptr, x.indices, x.data, lut, 3, np.int16, np.float32)


def test_dense_to_csr_matches_scipy():
    rng = np.random.default_rng(7)
    d = rng.normal(size=(60, 45)).astype(np.float32)
    d[np.abs(d) < 0.8] = 0.0
    d[5] = 0.0  # a fully-zero row
    data, indices, indptr = native_dense_to_csr(d)
    assert indptr.dtype == indices.dtype  # scipy requires one index dtype
    ours = sp.csr_matrix((data, indices, indptr), shape=d.shape)
    want = sp.csr_matrix(d)
    assert (ours != want).nnz == 0
    npt.assert_array_equal(ours.indptr, want.indptr)


def test_ingest_path_uses_native_and_matches(monkeypatch):
    """coo_from_csr_batch ACTUALLY routes through the native remap (the
    driver's col_index_dtype yields uint16, which the wrapper must accept —
    a round-5 review found the native path dead for that reason) and stays
    equal to the numpy fallback."""
    import infercnvpy_tpu.native as nat
    import infercnvpy_tpu.ops.sparse_ingest as si

    rng = np.random.default_rng(9)
    x = sp.random(30, 400, density=0.1, format="csr", dtype=np.float32, random_state=8)
    lut = np.full(400, -1, np.int64)
    used = rng.choice(400, size=350, replace=False)
    lut[used] = rng.permutation(350)
    width = 352
    assert si.col_index_dtype(width) == np.uint16  # the realistic driver dtype
    cap = si.round_nnz_cap(x.nnz)
    calls = []
    real = nat.native_coo_remap

    def counting(*a, **k):
        out = real(*a, **k)
        calls.append(out is not None)
        return out

    with monkeypatch.context() as m:
        m.setattr(nat, "native_coo_remap", counting)
        got = si.coo_from_csr_batch(x, lut, width, cap)
    assert calls == [True], "native remap was not used for the driver's uint16 col dtype"
    with monkeypatch.context() as m:
        m.setattr(nat, "native_coo_remap", lambda *a, **k: None)
        want = si.coo_from_csr_batch(x, lut, width, cap)
    for g, w in zip(got, want):
        npt.assert_array_equal(np.asarray(g), np.asarray(w))


def test_coo_remap_bf16_specials_match_mldtypes():
    """NaN/Inf survive the fused C bf16 conversion exactly like ml_dtypes
    (an unguarded round would turn NaN into Inf or -0.0)."""
    import ml_dtypes

    payload_nan = np.uint32(0x7FAB0001).view(np.float32)  # ml_dtypes canonicalizes
    data = np.array(
        [np.nan, -np.nan, np.inf, -np.inf, 0.0, -0.0, 3.0e38, 1e-40], np.float32
    )
    data[1] = payload_nan
    x = sp.csr_matrix(data.reshape(1, -1))
    x.data = data.copy()  # keep explicit zeros/specials as stored values
    x.indices = np.arange(8, dtype=np.int32)
    x.indptr = np.array([0, 8], np.int64)
    lut = np.arange(8, dtype=np.int64)
    bf = np.dtype(ml_dtypes.bfloat16)
    cols, vals, counts, nnz = native_coo_remap(x.indptr, x.indices, x.data, lut, 16, np.uint16, bf)
    want = data.astype(ml_dtypes.bfloat16)
    got = vals[:nnz].view(np.uint16)
    npt.assert_array_equal(got, want.view(np.uint16))
