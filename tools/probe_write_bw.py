#!/usr/bin/env python
"""Raw HBM write-bandwidth probe: Pallas kernel writing a (n, w) f32 output."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

n, w = 16384, 19968

def make_writer(rt, mode):
    def kernel(x_ref, o_ref):
        if mode == "bcast":
            o_ref[:] = jnp.broadcast_to(x_ref[:, 0:1], (rt, w)) * 1.000001
        else:
            for q in range(w // 128):
                o_ref[:, q * 128 : (q + 1) * 128] = x_ref[:, 0:128] * float(q + 1)
    @jax.jit
    def f(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, w), jnp.float32),
            grid=(n // rt,),
            in_specs=[pl.BlockSpec((rt, 256), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rt, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
        )(x)
    return f

def timeit(f):
    @partial(jax.jit, static_argnames=("iters",))
    def loop(seed, iters):
        x = jax.random.normal(jax.random.PRNGKey(seed), (n, 256), dtype=jnp.float32)
        def body(i, carry):
            xv, acc = carry
            y = f(xv)
            s = y[0, 7] + y[-1, -1]
            return (x + s * 1e-30, acc + s)
        _, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0.0)))
        return acc
    def t(iters):
        t0 = time.perf_counter(); float(loop(0, iters)); return time.perf_counter() - t0
    t(1); t(1)
    t1 = min(t(1) for _ in range(2))
    t101 = min(t(101) for _ in range(2))
    return (t101 - t1) / 100.0

gb = n * w * 4 / 1e9
for rt in (128, 256, 512):
    for mode in ("bcast", "blocks"):
        dt = timeit(make_writer(rt, mode))
        print(f"rt={rt} {mode:6s}: {dt*1e3:7.3f} ms  ({gb/dt:6.1f} GB/s write)", flush=True)
