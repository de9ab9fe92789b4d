#!/usr/bin/env python
"""Probe 2: unsorted scatter-add (the real densify shape) + true d2h bandwidth."""

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

    t0 = time.perf_counter()
    y = jax.jit(lambda: jnp.ones((128, 128)) @ jnp.ones((128, 128)))()
    y.block_until_ready()
    print(f"health matmul: {time.perf_counter() - t0:.1f}s", flush=True)

    # --- true d2h: device-computed data (no cached host buffer)
    for mb in (64, 512):
        n = mb * 1024 * 1024 // 4
        x = jax.jit(lambda: jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32))()
        x.block_until_ready()
        dt = t(lambda x=x: np.asarray(x), 3)
        print(f"d2h {mb} MB: {dt:.3f}s = {mb / dt:.0f} MB/s", flush=True)

    # --- densify exactly as the sparse-ingest path will: unsorted cols,
    # uint16, row ids from repeat, scatter-add
    R, W = 16384, 20480
    K = 1024
    rng = np.random.default_rng(1)
    cols = rng.permuted(np.broadcast_to(np.arange(W), (R, W)), axis=1)[:, :K]  # UNSORTED
    vals = rng.normal(size=(R, K)).astype(np.float32)
    counts = np.full(R, K, np.int32)
    cap = R * K
    cols_flat = cols.astype(np.uint16).ravel()
    vals_flat = vals.ravel()

    cols_d = jax.device_put(cols_flat, dev)
    vals_d = jax.device_put(vals_flat, dev)
    counts_d = jax.device_put(counts, dev)

    @jax.jit
    def densify_add(c, v, cnt):
        row_ids = jnp.repeat(jnp.arange(R, dtype=jnp.int32), cnt, total_repeat_length=cap)
        flat = row_ids * W + c.astype(jnp.int32)
        return jnp.zeros((R * W,), jnp.float32).at[flat].add(v).reshape(R, W)

    t0 = time.perf_counter()
    out = densify_add(cols_d, vals_d, counts_d)
    out.block_until_ready()
    print(f"unsorted scatter-add compile+run: {time.perf_counter() - t0:.1f}s", flush=True)
    dt = t(lambda: densify_add(cols_d, vals_d, counts_d).block_until_ready(), 3)
    print(f"unsorted scatter-add: {dt * 1e3:.1f} ms ({R * K / dt / 1e6:.0f} M elem/s)", flush=True)

    # correctness spot check
    got = np.asarray(out)
    want = np.zeros((R, W), np.float32)
    want[np.repeat(np.arange(R), K), cols.ravel()] = vals.ravel()
    print("max abs err:", np.abs(got - want).max(), flush=True)

    # sort-on-device variant: sort (flat, val) pairs then sorted scatter
    @jax.jit
    def densify_sorted(c, v, cnt):
        row_ids = jnp.repeat(jnp.arange(R, dtype=jnp.int32), cnt, total_repeat_length=cap)
        flat = row_ids * W + c.astype(jnp.int32)
        flat_s, v_s = jax.lax.sort([flat, v], num_keys=1)
        return (
            jnp.zeros((R * W,), jnp.float32)
            .at[flat_s]
            .add(v_s, indices_are_sorted=True)
            .reshape(R, W)
        )

    t0 = time.perf_counter()
    densify_sorted(cols_d, vals_d, counts_d).block_until_ready()
    print(f"sort+scatter compile+run: {time.perf_counter() - t0:.1f}s", flush=True)
    dt = t(lambda: densify_sorted(cols_d, vals_d, counts_d).block_until_ready(), 3)
    print(f"sort+sorted scatter-add: {dt * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
