#!/usr/bin/env python
"""Sweep row_tile for the fused kernel at the flagship bench shape."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

sys.argv = [sys.argv[0]]
import importlib.util
spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)

from infercnvpy_tpu.genome import build_window_plan
from infercnvpy_tpu.ops.infercnv_kernel import build_infercnv_fn, packed_width

n_cells, n_genes = 16384, 20000
window, step = 100, 10
var = bench._make_var(n_genes)
plan = build_window_plan(var, window, step)
width = packed_width(plan)
chunksize = 5000
num_chunks = -(-n_cells // chunksize)
print(f"packed width={width} n_windows={plan.n_windows}", flush=True)

for rt in [64, 128, 256, 512, 1024]:
    base = build_infercnv_fn(plan, n_ref_rows=2, lfc_clip=3.0, dynamic_threshold=1.5,
                             num_chunks=num_chunks, dtype=jnp.float32, row_tile=rt)

    @partial(jax.jit, static_argnames=("iters",))
    def bench_loop(seed, iters, base=base):
        key = jax.random.PRNGKey(seed)
        kx, kr = jax.random.split(key)
        x = jax.random.normal(kx, (n_cells, width), dtype=jnp.float32)
        ref0 = jax.random.normal(kr, (2, width), dtype=jnp.float32)
        chunk_ids = (jnp.arange(n_cells, dtype=jnp.int32) // chunksize).astype(jnp.int32)
        def body(i, carry):
            refv, acc = carry
            y, _ = base(x, refv, chunk_ids)
            s = jnp.sum(y[0, :8])
            return (ref0 + s * 1e-30, acc + s)
        _, acc = jax.lax.fori_loop(0, iters, body, (ref0, jnp.float32(0.0)))
        return acc

    def timed(iters):
        t0 = time.perf_counter()
        float(bench_loop(0, iters))
        return time.perf_counter() - t0

    timed(1); timed(21)
    best = min((timed(21) - timed(1)) / 20.0 for _ in range(3))
    gbps = n_cells * n_genes * 4 / best / 1e9
    print(f"row_tile={rt:5d}: {best*1e3:7.3f} ms  {gbps:6.1f} GB/s(genes) "
          f"{n_cells*width*4/best/1e9:6.1f} GB/s(packed-in)", flush=True)
