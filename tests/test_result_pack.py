"""Compressed result fetch (ops/result_pack.py): bitmask + compacted values.

The noise gate zeroes most of the cell×window matrix; the packed fetch must
reproduce the dense path's CSR BIT-IDENTICALLY while shipping fewer bytes
through the (slow) device→host direction.
"""

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest
import scipy.sparse as sp

from infercnvpy_tpu.ops.result_pack import compact_fn, mask_nnz_fn, mask_vals_to_csr
from infercnvpy_tpu.tl._infercnv import _infercnv_compute


def test_mask_vals_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(37, 101)).astype(np.float32)
    x[np.abs(x) < 1.0] = 0.0
    x[5] = 0.0
    import jax.numpy as jnp

    mask, nnz = mask_nnz_fn(101)(jnp.asarray(x), np.int32(37))
    nnz = int(nnz)
    assert nnz == int((x != 0).sum())
    vals = compact_fn(1 << 20)(jnp.asarray(x), np.int32(37))
    mat = mask_vals_to_csr(np.asarray(mask), np.asarray(vals)[:nnz], 101)
    assert (mat != sp.csr_matrix(x)).nnz == 0


def test_mask_excludes_padding_rows():
    """Rows at index >= n_valid must not contribute (driver pads the cell
    axis; padding rows survive the gate dense)."""
    import jax.numpy as jnp

    x = np.ones((8, 64), np.float32)
    mask, nnz = mask_nnz_fn(64)(jnp.asarray(x), np.int32(5))
    assert int(nnz) == 5 * 64
    vals = compact_fn(1 << 20)(jnp.asarray(x), np.int32(5))
    mat = mask_vals_to_csr(np.asarray(mask), np.asarray(vals)[: int(nnz)], 64)
    assert mat[:5].nnz == 5 * 64 and mat[5:].nnz == 0


def _toy(n_cells=100, n_genes=600, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(4):
        for s in np.sort(rng.integers(1, 2**27, size=n_genes // 4)):
            rows.append((f"chr{c + 1}", int(s)))
    var = pd.DataFrame(rows, columns=["chromosome", "start"])
    var["end"] = var["start"] + 1000
    expr = sp.random(n_cells, n_genes, density=0.08, format="csr", dtype=np.float32, random_state=seed)
    ref = np.asarray(expr[: n_cells // 4].mean(axis=0), dtype=np.float64)
    return expr, var, ref


KW = dict(
    lfc_clip=3.0, window_size=50, step=10, dynamic_threshold=1.5, chunksize=16,
    calculate_gene_values=False, batch_cells=32, dtype=np.float32,
)


@pytest.mark.parametrize("n_cells", [96, 100])  # 100: last batch padded
def test_packed_matches_dense(n_cells):
    expr, var, ref = _toy(n_cells=n_cells)
    _, dense, _ = _infercnv_compute(expr, var, ref, mesh=False, compress_results=False, **KW)
    _, packed, _ = _infercnv_compute(expr, var, ref, mesh=False, compress_results=True, **KW)
    assert (dense != packed).nnz == 0
    npt.assert_array_equal(np.asarray(dense.todense()), np.asarray(packed.todense()))


def test_packed_is_default_when_gated():
    expr, var, ref = _toy()
    stats = {}
    _infercnv_compute(expr, var, ref, stats=stats, mesh=False, **KW)
    assert stats["result_pack"] is True
    stats_off = {}
    _infercnv_compute(expr, var, ref, stats=stats_off, mesh=False, compress_results=False, **KW)
    assert stats_off["result_pack"] is False
    assert stats["d2h_bytes"] < stats_off["d2h_bytes"]
    # gate off -> auto-dense
    stats_ng = {}
    _infercnv_compute(expr, var, ref, stats=stats_ng, mesh=False, **dict(KW, dynamic_threshold=None))
    assert stats_ng["result_pack"] is False


def test_packed_on_mesh_matches_dense():
    """Per-shard compaction (shard_map, no cross-device cumsum) reproduces
    the dense mesh result bit-for-bit, including a padded final batch."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    expr, var, ref = _toy(n_cells=101)  # pads across shards AND batches
    _, dense, _ = _infercnv_compute(expr, var, ref, mesh=None, compress_results=False, **KW)
    _, packed, _ = _infercnv_compute(expr, var, ref, mesh=None, compress_results=True, **KW)
    assert (dense != packed).nnz == 0
    # mesh runs default to packing when gated
    from infercnvpy_tpu.tl import _infercnv as mod

    stats = {}
    _infercnv_compute(expr, var, ref, stats=stats, mesh=None, **KW)
    assert stats["result_pack"] is True and mod._LAST_RUN_INFO["sharded"] is True
    # and the packed mesh result equals the packed single-device result
    _, single, _ = _infercnv_compute(expr, var, ref, mesh=False, compress_results=True, **KW)
    npt.assert_allclose(
        np.asarray(packed.todense()), np.asarray(single.todense()), rtol=1e-5, atol=1e-6
    )
    # gene-values matrix packs per-shard too (packed_mesh gene payloads)
    kwg = dict(KW, calculate_gene_values=True)
    _, rd, gd = _infercnv_compute(expr, var, ref, mesh=None, compress_results=False, **kwg)
    _, rp, gp = _infercnv_compute(expr, var, ref, mesh=None, compress_results=True, **kwg)
    assert (rd != rp).nnz == 0
    m = ~np.isnan(gd)
    npt.assert_array_equal(m, ~np.isnan(gp))
    npt.assert_array_equal(gd[m], gp[m])


def test_packed_forced_without_gate():
    """compress_results=True works even ungated (dense survivors)."""
    expr, var, ref = _toy(n_cells=64)
    kw = dict(KW, dynamic_threshold=None)
    _, dense, _ = _infercnv_compute(expr, var, ref, mesh=False, compress_results=False, **kw)
    _, packed, _ = _infercnv_compute(expr, var, ref, mesh=False, compress_results=True, **kw)
    npt.assert_array_equal(np.asarray(dense.todense()), np.asarray(packed.todense()))


def test_gene_matrix_packs_too():
    """Gene-values mode's (much larger) per-gene matrix ships packed as well."""
    expr, var, ref = _toy(n_cells=96)
    kw = dict(KW, calculate_gene_values=True)
    s_on, s_off = {}, {}
    _, r1, g1 = _infercnv_compute(expr, var, ref, stats=s_on, mesh=False, **kw)
    _, r2, g2 = _infercnv_compute(expr, var, ref, stats=s_off, mesh=False, compress_results=False, **kw)
    assert s_on["d2h_bytes"] < 0.7 * s_off["d2h_bytes"]
    m = ~np.isnan(g1)
    npt.assert_array_equal(m, ~np.isnan(g2))
    npt.assert_array_equal(g1[m], g2[m])
    assert (r1 != r2).nnz == 0


def test_packed_with_gene_values_and_checkpoint(tmp_path):
    expr, var, ref = _toy()
    kw = dict(KW, calculate_gene_values=True)
    _, dense, gd = _infercnv_compute(expr, var, ref, mesh=False, compress_results=False, **kw)
    _, packed, gp = _infercnv_compute(
        expr, var, ref, mesh=False, compress_results=True, checkpoint_dir=tmp_path / "ck", **kw
    )
    assert (dense != packed).nnz == 0
    m = ~np.isnan(gd)
    npt.assert_array_equal(gd[m], gp[m])
    # resume from the packed-run checkpoint reproduces bit-identically
    _, resumed, gr = _infercnv_compute(
        expr, var, ref, mesh=False, compress_results=True, checkpoint_dir=tmp_path / "ck", **kw
    )
    assert (packed != resumed).nnz == 0
    npt.assert_array_equal(gp[m], gr[m])
