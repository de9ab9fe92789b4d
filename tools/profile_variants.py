#!/usr/bin/env python
"""Quick A/B timing of full_fn at several row tiles (low-noise harness)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
import importlib.util
spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec); spec.loader.exec_module(bench)

from infercnvpy_tpu.genome import build_window_plan
from infercnvpy_tpu.ops.infercnv_kernel import build_infercnv_fn, packed_width

n_cells, n_genes = 16384, 20000
var = bench._make_var(n_genes)
plan = build_window_plan(var, 100, 10)
width = packed_width(plan)

def timeit(make_body):
    @partial(jax.jit, static_argnames=("iters",))
    def loop(seed, iters):
        key = jax.random.PRNGKey(seed)
        kx, kr = jax.random.split(key)
        x = jax.random.normal(kx, (n_cells, width), dtype=jnp.float32)
        ref0 = jax.random.normal(kr, (2, width), dtype=jnp.float32)
        def body(i, carry):
            refv, acc = carry
            s = make_body(x, refv)
            return (ref0 + s * 1e-30, acc + s)
        _, acc = jax.lax.fori_loop(0, iters, body, (ref0, jnp.float32(0.0)))
        return acc
    def t(iters):
        t0 = time.perf_counter(); float(loop(0, iters)); return time.perf_counter() - t0
    t(1); t(1)
    t1 = min(t(1) for _ in range(3))
    t101 = min(t(101) for _ in range(3))
    return (t101 - t1) / 100.0

chunk_ids = jnp.asarray((np.arange(n_cells) // 5000).astype(np.int32))
tiles = [int(a) for a in sys.argv[1:] if not a.startswith("-")] or [128, 256, 512]
for RT in tiles:
    full = build_infercnv_fn(plan, n_ref_rows=2, lfc_clip=3.0, dynamic_threshold=1.5,
                             num_chunks=4, dtype=jnp.float32, row_tile=RT)
    def full_body(x, refv):
        y, _ = full(x, refv, chunk_ids)
        return jnp.sum(y[0, :8])
    dt = timeit(full_body)
    print(f"rt={RT} full_fn: {dt*1e3:7.3f} ms", flush=True)

if "--gene" in sys.argv:
    gene = build_infercnv_fn(plan, n_ref_rows=2, lfc_clip=3.0, dynamic_threshold=1.5,
                             num_chunks=4, calculate_gene_values=True, dtype=jnp.float32, row_tile=256)
    def gene_body(x, refv):
        y, g = gene(x, refv, chunk_ids)
        return jnp.sum(y[0, :8]) + jnp.nansum(g[0, :8])
    dt = timeit(gene_body)
    print(f"rt=256 gene_fn: {dt*1e3:7.3f} ms", flush=True)
