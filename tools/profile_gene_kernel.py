#!/usr/bin/env python
"""Attribute gene_project kernel time via debug_skip deltas (low-noise)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
import importlib.util
spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec); spec.loader.exec_module(bench)

from infercnvpy_tpu.genome import build_window_plan
from infercnvpy_tpu.ops.pallas_gene import gene_project, gene_projection_data

n_cells, n_genes = 16384, 20000
var = bench._make_var(n_genes)
plan = build_window_plan(var, 100, 10)
gpd = gene_projection_data(plan)
n_win = plan.n_windows

def timeit(make_body):
    @partial(jax.jit, static_argnames=("iters",))
    def loop(seed, iters):
        key = jax.random.PRNGKey(seed)
        kx, kt = jax.random.split(key)
        x = jax.random.normal(kx, (n_cells, n_win), dtype=jnp.float32)
        thr0 = jax.random.uniform(kt, (n_cells, 8), dtype=jnp.float32)
        def body(i, carry):
            xv, acc = carry
            s = make_body(xv, thr0)
            return (x + s * 1e-30, acc + s)
        _, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0.0)))
        return acc
    def t(iters):
        t0 = time.perf_counter(); float(loop(0, iters)); return time.perf_counter() - t0
    t(1); t(1)
    t1 = min(t(1) for _ in range(3))
    t101 = min(t(101) for _ in range(3))
    return (t101 - t1) / 100.0

def body_for(skip, rt=256):
    def f(x, thr):
        g = gene_project(x, thr, gpd, gate=True, row_tile=rt, debug_skip=skip)
        return jnp.sum(g[0, :8])
    return f

import os
if os.environ.get("GENEPROF_TILES"):
    for rt in [int(a) for a in os.environ["GENEPROF_TILES"].split(",")]:
        dt = timeit(body_for((), rt))
        print(f"rt={rt:4d} gene full: {dt*1e3:7.3f} ms", flush=True)
        dt = timeit(body_for(("prefix", "gmeans", "wmedian", "expand"), rt))
        print(f"rt={rt:4d} skip all : {dt*1e3:7.3f} ms", flush=True)
    raise SystemExit
cases = [
    ("gene full", ()),
    ("skip prefix", ("prefix",)),
    ("skip gmeans", ("gmeans",)),
    ("skip wmedian", ("wmedian",)),
    ("skip expand", ("expand",)),
    ("skip all", ("prefix", "gmeans", "wmedian", "expand")),
]
for name, skip in cases:
    dt = timeit(body_for(skip))
    print(f"{name:14s}: {dt*1e3:7.3f} ms", flush=True)
