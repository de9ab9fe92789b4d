"""Driver pipeline behavior: warm re-runs, prefetch overlap, progress.

Round-4 regression background: the bench's "pipelined" e2e mode was 2.6x
SLOWER than the serialized stats mode because each `_infercnv_compute` call
built fresh jit objects and recompiled.  The fix memoizes the built
transforms module-level and dispatches every call through one AOT-compiled
executable per (transform, signature) — these tests pin that contract.
"""

import numpy as np
import numpy.testing as npt
import pandas as pd
import pytest
import scipy.sparse as sp

from infercnvpy_tpu.tl._infercnv import _EXEC_CACHE, _infercnv_compute


def _toy(n_cells=96, n_genes=600, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(4):
        starts = np.sort(rng.integers(1, 2**27, size=n_genes // 4))
        rows += [(f"chr{c + 1}", int(s)) for s in starts]
    var = pd.DataFrame(rows, columns=["chromosome", "start"])
    var["end"] = var["start"] + 1000
    expr = sp.random(n_cells, n_genes, density=0.08, format="csr", dtype=np.float32, random_state=seed)
    ref = np.asarray(expr[: n_cells // 4].mean(axis=0), dtype=np.float64)
    return expr, var, ref


KW = dict(
    lfc_clip=3.0,
    window_size=50,
    step=10,
    dynamic_threshold=1.5,
    chunksize=16,
    calculate_gene_values=False,
    batch_cells=32,
    dtype=np.float32,
)


def test_repeat_run_hits_executable_cache():
    """A second identical run must reuse compiled executables, not rebuild."""
    expr, var, ref = _toy()
    stats = {}
    _, r1, _ = _infercnv_compute(expr, var, ref, stats=stats, mesh=False, device_densify=True, **KW)
    n_exec = len(_EXEC_CACHE)
    _, r2, _ = _infercnv_compute(expr, var, ref, mesh=False, device_densify=True, **KW)
    assert len(_EXEC_CACHE) == n_exec, "pipelined re-run recompiled despite identical config"
    assert (r1 != r2).nnz == 0

    # the builders are memoized too: same config -> same jit object
    from infercnvpy_tpu.genome.plan import build_window_plan
    from infercnvpy_tpu.ops.infercnv_kernel import build_infercnv_fn

    plan = build_window_plan(var, 50, 10)
    kw = dict(n_ref_rows=1, lfc_clip=3.0, dynamic_threshold=1.5, num_chunks=6)
    assert build_infercnv_fn(plan, **kw) is build_infercnv_fn(plan, **kw)
    plan2 = build_window_plan(var, 50, 10)
    assert plan.cache_key == plan2.cache_key
    assert build_infercnv_fn(plan2, **kw) is build_infercnv_fn(plan, **kw)


@pytest.mark.parametrize("mesh_opt", [False, None])
def test_prefetch_matches_serialized(mesh_opt):
    """The threaded prefetch path (stats=None, multiple batches) must be
    bit-identical to the serialized stats path."""
    expr, var, ref = _toy(n_cells=128, seed=2)
    stats = {}
    _, serialized, _ = _infercnv_compute(expr, var, ref, stats=stats, mesh=mesh_opt, **KW)
    _, pipelined, _ = _infercnv_compute(expr, var, ref, mesh=mesh_opt, **KW)
    npt.assert_array_equal(np.asarray(serialized.todense()), np.asarray(pipelined.todense()))


def test_progress_callback_per_batch():
    expr, var, ref = _toy(n_cells=96)
    events = []
    _infercnv_compute(expr, var, ref, mesh=False, progress=events.append, **KW)
    assert len(events) == 3  # 96 cells / 32 batch_cells
    assert [e["cells_done"] for e in events] == [32, 64, 96]
    assert all(e["cells_total"] == 96 for e in events)
    assert events[-1]["eta_sec"] == pytest.approx(0.0, abs=1e-6)
    assert all(e["cells_per_sec"] > 0 for e in events)


def test_progress_stderr_line(capsys):
    expr, var, ref = _toy(n_cells=64)
    _infercnv_compute(expr, var, ref, mesh=False, progress=True, **KW)
    err = capsys.readouterr().err
    assert "infercnv: 64/96" not in err  # sanity: totals match this dataset
    assert "infercnv: 64/64 cells" in err


@pytest.mark.parametrize("transfer", ["bfloat16", "float16"])
@pytest.mark.parametrize("mode", ["sparse", "dense"])
def test_bf16_transfer_error_bound(mode, transfer):
    """Opt-in reduced-precision transfer halves shipped value bytes; output
    error stays within the input-rounding bound (≤2^-8 relative, smoothed)."""
    expr, var, ref = _toy(n_cells=128, seed=5)
    kw = dict(KW, dynamic_threshold=None)  # gate off: compare continuous values
    if mode == "dense":
        expr = np.asarray(expr.todense())
    s32, sbf = {}, {}
    _, full, _ = _infercnv_compute(expr, var, ref, stats=s32, mesh=False, device_densify=True, **kw)
    _, red, _ = _infercnv_compute(
        expr, var, ref, stats=sbf, mesh=False, device_densify=True, transfer_dtype=transfer, **kw
    )
    full = np.asarray(full.todense())
    red = np.asarray(red.todense())
    scale = np.abs(full).max()
    assert np.abs(red - full).max() <= 0.01 * scale + 1e-4
    # the value payload halves; index/count arrays are unchanged
    assert sbf["h2d_bytes"] < s32["h2d_bytes"]
    if mode == "dense":
        assert sbf["h2d_bytes"] <= 0.55 * s32["h2d_bytes"]
    assert sbf.get("transfer_dtype") == transfer


def test_bf16_transfer_on_mesh():
    """Reduced-precision transfer composes with the sharded (mesh) path."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    expr, var, ref = _toy(n_cells=128, seed=6)
    kw = dict(KW, dynamic_threshold=None)
    _, full, _ = _infercnv_compute(expr, var, ref, mesh=None, **kw)
    _, red, _ = _infercnv_compute(expr, var, ref, mesh=None, transfer_dtype="bfloat16", **kw)
    full = np.asarray(full.todense())
    red = np.asarray(red.todense())
    assert np.abs(red - full).max() <= 0.01 * np.abs(full).max() + 1e-4


def test_bf16_transfer_in_checkpoint_fingerprint(tmp_path):
    """transfer_dtype changes numerics, so it must invalidate a checkpoint."""
    from infercnvpy_tpu.tl._infercnv import _ckpt_fingerprint

    expr, var, ref = _toy(n_cells=64)
    args = dict(
        n_cells=64, n_genes=expr.shape[1], window_size=50, step=10, lfc_clip=3.0,
        dynamic_threshold=1.5, chunksize=16, calculate_gene_values=False,
        batch_cells=32, cdtype=np.float32,
    )
    assert _ckpt_fingerprint(expr, var, ref, **args) != _ckpt_fingerprint(
        expr, var, ref, transfer_dtype="bfloat16", **args
    )


def test_fingerprint_detects_row_permutation(tmp_path):
    """Round-4 advisor (medium): permuting cells must invalidate a checkpoint."""
    from infercnvpy_tpu.tl._infercnv import _ckpt_fingerprint

    expr, var, ref = _toy(n_cells=64)
    perm = np.random.default_rng(0).permutation(64)
    # make sure the permutation actually moves rows across batch boundaries
    assert (perm[:32] != np.arange(32)).any()
    args = dict(
        n_cells=64, n_genes=expr.shape[1], window_size=50, step=10, lfc_clip=3.0,
        dynamic_threshold=1.5, chunksize=16, calculate_gene_values=False,
        batch_cells=32, cdtype=np.float32,
    )
    fp1 = _ckpt_fingerprint(expr, var, ref, **args)
    fp2 = _ckpt_fingerprint(expr[perm], var, ref, **args)
    assert fp1 != fp2

    dense = np.asarray(expr.todense())
    fp3 = _ckpt_fingerprint(dense, var, ref, **args)
    fp4 = _ckpt_fingerprint(dense[perm], var, ref, **args)
    assert fp3 != fp4
    # same data -> same fingerprint (stability)
    assert fp1 == _ckpt_fingerprint(expr.copy(), var, ref, **args)
    assert fp3 == _ckpt_fingerprint(dense.copy(), var, ref, **args)

    # swapping two equal-nnz rows WITHIN one batch must also invalidate:
    # build two rows with identical nnz but different values
    d2 = dense.copy()
    d2[[1, 2]] = d2[[2, 1]]
    assert (d2 != dense).any()
    assert _ckpt_fingerprint(d2, var, ref, **args) != fp3
    s2 = sp.csr_matrix(d2)
    base = sp.csr_matrix(dense)
    args2 = dict(args)
    fp_a = _ckpt_fingerprint(base, var, ref, **args2)
    fp_b = _ckpt_fingerprint(s2, var, ref, **args2)
    assert fp_a != fp_b


def test_clear_transform_caches():
    """The service-facing cache reset empties every memoized layer."""
    import infercnvpy_tpu.ops.infercnv_kernel as ik
    import infercnvpy_tpu.ops.knn as knn_mod
    from infercnvpy_tpu.parallel.mesh import cell_mesh
    from infercnvpy_tpu.tl._infercnv import _EXEC_CACHE, clear_transform_caches

    expr, var, ref = _toy()
    _infercnv_compute(expr, var, ref, mesh=False, device_densify=True, **KW)
    import jax

    if len(jax.devices()) > 1:
        knn_mod.exact_knn(np.random.default_rng(0).normal(size=(40, 8)).astype(np.float32),
                          5, block=8, mesh=cell_mesh())
        assert knn_mod._SHARDED_CACHE
    assert _EXEC_CACHE and ik._BUILD_CACHE
    clear_transform_caches()
    assert not _EXEC_CACHE and not ik._BUILD_CACHE and not knn_mod._SHARDED_CACHE
    # everything rebuilds transparently
    _, res, _ = _infercnv_compute(expr, var, ref, mesh=False, device_densify=True, **KW)
    assert res.shape[0] == expr.shape[0]


def test_fingerprint_exact_on_sparse_values():
    """Round-5 review repro: with a trailing empty row, the old clipped
    reduceat excluded the last stored value — editing it collided.  The
    sparse fingerprint is now an exact content hash."""
    from infercnvpy_tpu.tl._infercnv import _ckpt_fingerprint

    var = pd.DataFrame({"chromosome": ["chr1"] * 4, "start": [1, 2, 3, 4]})
    var["end"] = var["start"] + 1
    ref = np.zeros((1, 4))
    args = dict(
        n_cells=3, n_genes=4, window_size=2, step=1, lfc_clip=3.0,
        dynamic_threshold=1.5, chunksize=2, calculate_gene_values=False,
        batch_cells=2, cdtype=np.float32,
    )
    a = sp.csr_matrix(np.array([[1.0, 2, 0, 0], [0, 5, 6, 0], [0, 0, 0, 0]], np.float32))
    b = a.copy()
    b.data = b.data.copy()
    b.data[-1] = 99.0  # edit the LAST stored value (row 1), last row empty
    assert _ckpt_fingerprint(a, var, ref, **args) != _ckpt_fingerprint(b, var, ref, **args)

    # same-row value/column rearrangements must differ too
    c = sp.csr_matrix(np.array([[2.0, 1, 0, 0], [0, 5, 6, 0], [0, 0, 0, 0]], np.float32))
    d = sp.csr_matrix(np.array([[0.0, 2, 1, 0], [0, 5, 6, 0], [0, 0, 0, 0]], np.float32))
    fps = {_ckpt_fingerprint(m, var, ref, **args) for m in (a, c, d)}
    assert len(fps) == 3


def test_fingerprint_handles_empty_rows():
    from infercnvpy_tpu.tl._infercnv import _ckpt_fingerprint

    expr, var, ref = _toy(n_cells=64)
    lil = expr.tolil()
    lil[0, :] = 0
    lil[63, :] = 0
    x = lil.tocsr()
    x.eliminate_zeros()
    args = dict(
        n_cells=64, n_genes=expr.shape[1], window_size=50, step=10, lfc_clip=3.0,
        dynamic_threshold=1.5, chunksize=16, calculate_gene_values=False,
        batch_cells=32, cdtype=np.float32,
    )
    fp = _ckpt_fingerprint(x, var, ref, **args)
    assert fp == _ckpt_fingerprint(x.copy(), var, ref, **args)
    assert fp != _ckpt_fingerprint(expr, var, ref, **args)
