#!/usr/bin/env python
"""Attribute gene-values-mode time: fused base, +uvals, +wmedian, +gate, +gather."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
import importlib.util
spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec); spec.loader.exec_module(bench)

from infercnvpy_tpu.genome import build_window_plan
from infercnvpy_tpu.ops.infercnv_kernel import packed_width
from infercnvpy_tpu.ops.pallas_fused import fused_center_smooth_median
from infercnvpy_tpu.ops.pallas_select import row_median_weighted

n_cells, n_genes = 16384, 20000
var = bench._make_var(n_genes)
plan = build_window_plan(var, 100, 10)
width = packed_width(plan)
n_win = plan.n_windows

lo_np, hi_np = plan.gene_win_lo, plan.gene_win_hi
covered_np = lo_np >= 0
enc = lo_np.astype(np.int64) * (n_win + 1) + hi_np
uniq, inv = np.unique(enc[covered_np], return_inverse=True)
g_counts = np.bincount(inv, minlength=len(uniq)).astype(np.int32)
g_lo = (uniq // (n_win + 1)).astype(np.int32)
g_hi = (uniq % (n_win + 1)).astype(np.int32)
g_of_gene = np.zeros(len(lo_np), np.int32)
g_of_gene[covered_np] = inv
print(f"n_windows={n_win} n_groups={len(uniq)} n_genes_used={covered_np.sum()}", flush=True)

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
    t(1); t(9)
    return min((t(9) - t(1)) / 8.0 for _ in range(3))

def stage(level):
    def f(x, refv):
        x_res, rs, rsq, _m = fused_center_smooth_median(x, refv, plan, lfc_clip=3.0, n_ref=2)
        out = jnp.sum(x_res[0, :8])
        if level >= 1:
            prefix = jnp.concatenate([jnp.zeros((x_res.shape[0], 1), jnp.float32), jnp.cumsum(x_res, axis=1)], axis=1)
            u_cnt = jnp.asarray((g_hi - g_lo + 1).astype(np.float32))[None, :]
            uvals = (prefix[:, jnp.asarray(g_hi + 1)] - prefix[:, jnp.asarray(g_lo)]) / u_cnt
            out = out + jnp.sum(uvals[0, :8])
        if level >= 2:
            gmed = row_median_weighted(uvals, g_counts)
            uvals = uvals - gmed[:, None]
            out = out + jnp.sum(uvals[0, :8])
        if level >= 3:
            gene_res = jnp.where(jnp.asarray(covered_np)[None, :], uvals[:, jnp.asarray(g_of_gene)], jnp.float32(jnp.nan))
            out = out + jnp.nansum(gene_res[0, :8])
        return out
    return f

for lv, name in [(0, "fused only"), (1, "+uvals(cumsum+gather)"), (2, "+wmedian"), (3, "+final gene gather")]:
    dt = timeit(stage(lv))
    print(f"{name:24s}: {dt*1e3:7.3f} ms", flush=True)
