"""Trace-capture subsystem (infercnvpy_tpu.profiling).

The reference has no profiling support; SURVEY §5 requires real
``jax.profiler`` trace capture here.  These tests run the capture end-to-end
on the CPU backend and assert an XProf artifact is actually produced.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from infercnvpy_tpu import profiling, tl


def _has_profile_artifact(root) -> bool:
    for dirpath, _dirnames, filenames in os.walk(root):
        if any(f.endswith((".xplane.pb", ".trace.json.gz", ".trace")) for f in filenames):
            return True
    return False


def test_trace_captures_xplane(tmp_path):
    logdir = tmp_path / "trace"
    with profiling.trace(logdir) as d:
        assert d == str(logdir)
        with profiling.annotate("matmul-region"):
            a = jnp.ones((64, 64))
            np.asarray(jax.jit(lambda x: x @ x)(a)).sum()
    assert profiling.last_trace_dir == str(logdir)
    assert _has_profile_artifact(logdir), "no profiler artifact written"


def test_maybe_trace_noop_without_env(monkeypatch):
    monkeypatch.delenv("INFERCNVPY_TPU_TRACE_DIR", raising=False)
    with profiling.maybe_trace("stage") as d:
        assert d is None


def test_maybe_trace_env_driven(tmp_path, monkeypatch):
    monkeypatch.setenv("INFERCNVPY_TPU_TRACE_DIR", str(tmp_path))
    with profiling.maybe_trace("unit") as d:
        assert d is not None and d.startswith(str(tmp_path))
        np.asarray(jax.jit(jnp.sin)(jnp.ones(8))).sum()
    entries = list(tmp_path.iterdir())
    assert len(entries) == 1 and entries[0].name.startswith("unit-")
    assert _has_profile_artifact(entries[0])


def test_infercnv_driver_traced(tmp_path, monkeypatch):
    """tl.infercnv captures a trace per call when the env var is set."""
    from infercnvpy_tpu.datasets import synthetic_cnv_dataset

    adata = synthetic_cnv_dataset(n_cells=40, n_genes=400, seed=0)
    monkeypatch.setenv("INFERCNVPY_TPU_TRACE_DIR", str(tmp_path))
    tl.infercnv(adata, reference_key="cell_type", reference_cat="Oligodendrocytes (non-malignant)")
    captures = [p for p in tmp_path.iterdir() if p.name.startswith("infercnv-")]
    assert len(captures) == 1
    assert _has_profile_artifact(captures[0])
