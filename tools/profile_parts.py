#!/usr/bin/env python
"""Attribute fused-kernel time: full vs skip-median/conv/center, plus full fn."""
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
from infercnvpy_tpu.ops.pallas_fused import fused_center_smooth_median

n_cells, n_genes = 16384, 20000
var = bench._make_var(n_genes)
plan = build_window_plan(var, 100, 10)
width = packed_width(plan)
RT = int(sys.argv[1]) if len(sys.argv) > 1 else 128

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
    # long loop minus short loop: per-iter time with tunnel RTT cancelled;
    # min-of-3 on each side bounds the RTT jitter (~10s of ms) that used to
    # alias into the per-iteration number at (jitter/20) scale
    t1 = min(t(1) for _ in range(3))
    t101 = min(t(101) for _ in range(3))
    return (t101 - t1) / 100.0

def kernel_body(skip):
    def f(x, refv):
        out, rs, rsq, med = fused_center_smooth_median(
            x, refv, plan, lfc_clip=3.0, n_ref=2, row_tile=RT, debug_skip=skip)
        return jnp.sum(out[0, :8]) + rs[0] * 1e-30
    return f

chunk_ids = jnp.asarray((np.arange(n_cells) // 5000).astype(np.int32))
full = build_infercnv_fn(plan, n_ref_rows=2, lfc_clip=3.0, dynamic_threshold=1.5,
                         num_chunks=4, dtype=jnp.float32, row_tile=RT)
def full_body(x, refv):
    y, _ = full(x, refv, chunk_ids)
    return jnp.sum(y[0, :8])

cases = [
    ("kernel full", kernel_body(())),
    ("skip median", kernel_body(("median",))),
    ("skip conv", kernel_body(("conv",))),
    ("skip center", kernel_body(("center",))),
    ("skip all3", kernel_body(("median", "conv", "center"))),
    ("full_fn(+gate)", full_body),
]
for name, f in cases:
    dt = timeit(f)
    print(f"rt={RT} {name:15s}: {dt*1e3:7.3f} ms  ({n_cells*width*4/dt/1e9:6.1f} GB/s in)", flush=True)

probes = [("bt_only", ("bt_only",)), ("taps_noshift", ("noshift",))]
for name, skip in probes:
    dt = timeit(kernel_body(skip))
    print(f"rt={RT} {name:15s}: {dt*1e3:7.3f} ms", flush=True)
