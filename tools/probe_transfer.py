#!/usr/bin/env python
"""One-off probe: tunnel transfer bandwidth + device-side densify options.

Answers, on the real TPU:
1. host->device and device->host bandwidth at several sizes
2. XLA scatter throughput for CSR->packed-dense densification on device
3. dispatch latency through the tunnel
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def t(fn, n=3):
    best = 1e30
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    # --- dispatch latency: tiny array round trip
    tiny = np.zeros(8, np.float32)
    d = jax.device_put(tiny, dev)
    lat = t(lambda: np.asarray(jax.device_put(tiny, dev)), 5)
    print(f"tiny roundtrip latency: {lat * 1e3:.1f} ms", flush=True)

    # --- h2d / d2h bandwidth
    for mb in (64, 256, 1024):
        x = np.random.default_rng(0).random(mb * 1024 * 1024 // 4, np.float32)
        jax.device_put(x, dev).block_until_ready()  # warm
        dt = t(lambda x=x: jax.device_put(x, dev).block_until_ready(), 3)
        xd = jax.device_put(x, dev)
        dt2 = t(lambda xd=xd: np.asarray(xd), 3)
        print(f"h2d {mb} MB: {dt:.3f}s = {mb / dt:.0f} MB/s | d2h: {dt2:.3f}s = {mb / dt2:.0f} MB/s", flush=True)

    # --- device densify options
    R, W = 16384, 20480
    K = 1024  # nnz per row
    rng = np.random.default_rng(1)
    cols = np.sort(rng.permuted(np.broadcast_to(np.arange(W), (R, W)), axis=1)[:, :K], axis=1)
    vals = rng.normal(size=(R, K)).astype(np.float32)
    flat = (cols + (np.arange(R, dtype=np.int64) * W)[:, None]).ravel()
    cols_d = jax.device_put(cols.astype(np.int32), dev)
    vals_d = jax.device_put(vals, dev)
    flat_d = jax.device_put(flat, dev)

    # (a) flat 1-D sorted unique scatter
    @jax.jit
    def densify_flat(flat_idx, v):
        out = jnp.zeros((R * W,), jnp.float32)
        out = out.at[flat_idx].set(v.ravel(), indices_are_sorted=True, unique_indices=True)
        return out.reshape(R, W)

    try:
        t0 = time.perf_counter()
        y = densify_flat(flat_d, vals_d).block_until_ready()
        print(f"flat scatter compile+run: {time.perf_counter() - t0:.1f}s", flush=True)
        dt = t(lambda: densify_flat(flat_d, vals_d).block_until_ready(), 3)
        print(f"(a) flat sorted scatter: {dt * 1e3:.1f} ms  ({R * K / dt / 1e6:.0f} M elem/s)", flush=True)
        del y
    except Exception as e:
        print("(a) flat scatter FAILED:", repr(e), flush=True)

    # (b) vmapped per-row scatter
    @jax.jit
    def densify_rows(c, v):
        def row(ci, vi):
            return jnp.zeros((W,), jnp.float32).at[ci].set(vi, indices_are_sorted=True, unique_indices=True)

        return jax.vmap(row)(c, v)

    try:
        t0 = time.perf_counter()
        densify_rows(cols_d, vals_d).block_until_ready()
        print(f"row scatter compile+run: {time.perf_counter() - t0:.1f}s", flush=True)
        dt = t(lambda: densify_rows(cols_d, vals_d).block_until_ready(), 3)
        print(f"(b) vmap row scatter: {dt * 1e3:.1f} ms  ({R * K / dt / 1e6:.0f} M elem/s)", flush=True)
    except Exception as e:
        print("(b) row scatter FAILED:", repr(e), flush=True)

    # (c) segment_sum formulation
    @jax.jit
    def densify_seg(flat_idx, v):
        return jax.ops.segment_sum(v.ravel(), flat_idx, num_segments=R * W, indices_are_sorted=True).reshape(R, W)

    try:
        t0 = time.perf_counter()
        densify_seg(flat_d, vals_d).block_until_ready()
        print(f"segment_sum compile+run: {time.perf_counter() - t0:.1f}s", flush=True)
        dt = t(lambda: densify_seg(flat_d, vals_d).block_until_ready(), 3)
        print(f"(c) segment_sum: {dt * 1e3:.1f} ms  ({R * K / dt / 1e6:.0f} M elem/s)", flush=True)
    except Exception as e:
        print("(c) segment_sum FAILED:", repr(e), flush=True)


if __name__ == "__main__":
    main()
