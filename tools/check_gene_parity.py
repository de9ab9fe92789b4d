#!/usr/bin/env python
"""On-device parity check: Pallas gene back-projection vs an XLA oracle.

The CPU test suite runs the gene kernel in interpret mode, where the
hardware prefix-sum formulation (log-shift ``pltpu.roll`` passes) is only
exercised via ``force_roll`` — an emulation.  This tool closes the gap by
running the REAL kernel on the real accelerator and comparing it against an
independent pure-XLA implementation of the same epilogue (cumsum prefix,
group means, weighted median via sort, gate, expansion).

Prints one JSON line; ``bench.py`` embeds the result in the bench record so
every driver bench session carries a fresh on-device parity artifact.

Reference semantics being checked: per-gene value = mean of covering
windows, median-centered, noise-gated (reference: tl/_infercnv.py:247-291,
443-453).
"""

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def xla_gene_epilogue(x_res, thr, gpd, gate: bool):
    """Independent XLA formulation of the gene epilogue (the oracle)."""
    import jax.numpy as jnp

    c = jnp.cumsum(x_res.astype(jnp.float32), axis=1)
    hi = jnp.asarray(gpd.g_hi.astype(np.int32))
    lo = jnp.asarray(gpd.g_lo.astype(np.int32))
    ph = c[:, hi]
    plo = jnp.where((lo - 1) >= 0, c[:, jnp.maximum(lo - 1, 0)], 0.0)
    uv = (ph - plo) / (hi - lo + 1).astype(jnp.float32)
    gidx = jnp.asarray(gpd.gidx_sorted.astype(np.int32))
    gvals = uv[:, gidx]  # (cells, total) — group value repeated per gene
    med = jnp.median(gvals, axis=1)  # even count: mean of middle two (kernel ditto)
    u_res = uv - med[:, None]
    if gate:
        u_res = jnp.where(jnp.abs(u_res) < thr[:, None], 0.0, u_res)
    return u_res[:, gidx]


def run_check(n_cells: int = 512, n_genes: int = 8000, window: int = 100, step: int = 10, seed: int = 0):
    import jax
    import jax.numpy as jnp
    import pandas as pd

    from infercnvpy_tpu.genome import build_window_plan
    from infercnvpy_tpu.ops.pallas_gene import gene_project, gene_projection_data

    rng = np.random.default_rng(seed)
    # multi-chromosome var with both regular and small chromosomes
    rows = []
    for ci, frac in enumerate([0.4, 0.3, 0.2, 0.08, 0.02]):
        k = max(4, int(n_genes * frac))
        for s in np.sort(rng.integers(1, 2**27, size=k)):
            rows.append((f"chr{ci + 1}", int(s)))
    var = pd.DataFrame(rows, columns=["chromosome", "start"])
    var["end"] = var["start"] + 1000
    plan = build_window_plan(var, window, step)
    gpd = gene_projection_data(plan)

    x_res = jnp.asarray(rng.normal(size=(n_cells, plan.n_windows)).astype(np.float32))
    thr = jnp.asarray(np.abs(rng.normal(size=n_cells)).astype(np.float32) * 0.1)
    thr8 = jnp.zeros((n_cells, 8), jnp.float32).at[:, 0].set(thr)

    results = {}
    for gate in (False, True):
        got = np.asarray(gene_project(x_res, thr8, gpd, gate=gate, row_tile=256))
        want = np.asarray(xla_gene_epilogue(x_res, thr, gpd, gate=gate))
        scale = float(np.abs(want).max())
        max_diff = float(np.abs(got - want).max())
        entry = {"max_abs_diff": float(f"{max_diff:.3g}"), "scale": float(f"{scale:.3g}")}
        if gate:
            # gate flips are legitimate at f32 prefix-order differences only
            # when |value| sits within one ulp-ish band of the threshold
            mism = (got == 0) != (want == 0)
            entry["gate_mismatch_frac"] = float(f"{mism.mean():.3g}")
        results["gated" if gate else "ungated"] = entry

    tol = 2e-3 * max(results["ungated"]["scale"], 1e-9)
    ok = (
        results["ungated"]["max_abs_diff"] <= tol
        and results["gated"]["gate_mismatch_frac"] <= 1e-3
    )
    return {
        "check": "pallas_gene_parity",
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "n_cells": n_cells,
        "n_windows": plan.n_windows,
        "n_covered_genes": gpd.total,
        **results,
        "pass": bool(ok),
    }


if __name__ == "__main__":
    out = run_check()
    print(json.dumps(out))
    sys.exit(0 if out["pass"] else 1)
