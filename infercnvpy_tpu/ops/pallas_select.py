"""Pallas TPU kernel: exact per-row median via bitwise radix selection.

XLA's per-row median sorts the whole (cells × windows) matrix — many HBM
round-trips between sort passes (~14 ms for 16k × 1793 f32 on v5e).  This
kernel instead finds the exact k-th order statistic with a 32-step binary
search over float *bit patterns*, entirely VMEM-resident: one HBM read of the
tile, then 32 compare+count passes on the VPU (~1-2 ms).

Float ordering trick: for IEEE-754, mapping the int32 bit pattern ``i`` to
``key = i XOR (0x7FFFFFFF AND (i >> 31))`` makes signed-integer comparison
order match total float order (flip the lower 31 bits of negatives).  The map
is an involution, so the selected key converts back the same way.

Exactness: the search converges to an actual element bit pattern, so the
result equals ``np.sort(row)[k]`` bit-for-bit; even-width medians average the
two middle elements exactly like ``np.median``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["row_median", "row_kth_smallest", "row_median_weighted"]

# Scoped-VMEM ceiling for these kernels.  The compiler default is 16 MB; a
# (row_tile=256 × width=20k) f32 tile plus its int32 key copy is ~40 MB, which
# is exactly how round 2's bench died (BENCH_r02: 39 MB vs 16 MB at 20k genes).
_VMEM_LIMIT_BYTES = 128 * 1024 * 1024


def _auto_row_tile(requested: int, n: int, w: int, n_bufs: float = 3.0) -> int:
    """Shrink the row tile so ~n_bufs f32 copies of (tile × w) fit in budget."""
    budget = int(_VMEM_LIMIT_BYTES * 0.7)
    cap = int(budget / (n_bufs * 4.0 * max(w, 1)))
    cap = max(8, (cap // 8) * 8)
    return max(1, min(requested, cap, n))


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _float_key(x):
    i = jax.lax.bitcast_convert_type(x, jnp.int32)
    return i ^ (jnp.int32(0x7FFFFFFF) & (i >> 31))


def _key_to_float(key):
    i = key ^ (jnp.int32(0x7FFFFFFF) & (key >> 31))
    return jax.lax.bitcast_convert_type(i, jnp.float32)


def _select_kth(keys, k: int, n_valid: int):
    """k-th smallest key per row (0-based) of keys (TC, W) via 32-step bisection."""
    tc = keys.shape[0]
    lo0 = jnp.full((tc, 1), jnp.int32(-(2**31)))
    hi0 = jnp.full((tc, 1), jnp.int32(2**31 - 1))

    def body(_, state):
        lo, hi = state
        # overflow-safe signed midpoint: (lo & hi) + ((lo ^ hi) >> 1)
        mid = (lo & hi) + ((lo ^ hi) >> 1)
        cnt = jnp.sum((keys <= mid).astype(jnp.int32), axis=1, keepdims=True)
        go_low = cnt >= (k + 1)
        new_hi = jnp.where(go_low, mid, hi)
        new_lo = jnp.where(go_low, lo, mid + 1)
        return new_lo, new_hi

    lo, hi = jax.lax.fori_loop(0, 32, body, (lo0, hi0))
    return lo[:, 0]


def _median_kernel(x_ref, out_ref, *, w_valid: int):
    x = x_ref[:]
    w_pad = x.shape[1]
    keys = _float_key(x)
    if w_pad != w_valid:
        # mask lane padding to +max so it never ranks below real data
        col = jax.lax.broadcasted_iota(jnp.int32, keys.shape, dimension=1)
        keys = jnp.where(col < w_valid, keys, jnp.int32(2**31 - 1))
    k2 = w_valid // 2
    v2 = _key_to_float(_select_kth(keys, k2, w_valid))
    if w_valid % 2 == 1:
        out_ref[:, 0] = v2
    else:
        v1 = _key_to_float(_select_kth(keys, k2 - 1, w_valid))
        out_ref[:, 0] = (v1 + v2) / 2.0


@partial(jax.jit, static_argnames=("row_tile",))
def _row_median_impl(x, row_tile: int):
    n, w = x.shape
    kernel = partial(_median_kernel, w_valid=w)
    grid = (n // row_tile,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec((row_tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((row_tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=_interpret(),
    )(x)[:, 0]


def row_median(x, row_tile: int = 256):
    """Exact per-row median of a 2-D f32 array (np.median semantics)."""
    n, w = x.shape
    if n == 0 or w == 0:
        return jnp.zeros((n,), jnp.float32)
    row_tile = _auto_row_tile(row_tile, n, w)
    pad = (-n) % row_tile
    xj = jnp.asarray(x, jnp.float32)
    if pad:
        xj = jnp.concatenate([xj, jnp.zeros((pad, w), jnp.float32)], axis=0)
    med = _row_median_impl(xj, row_tile)
    return med[:n]


def row_kth_smallest(x, k: int, row_tile: int = 256):
    """Exact per-row k-th smallest (0-based) of a 2-D f32 array."""
    n, w = x.shape
    row_tile = _auto_row_tile(row_tile, n, w)
    pad = (-n) % row_tile
    xj = jnp.asarray(x, jnp.float32)
    if pad:
        xj = jnp.concatenate([xj, jnp.zeros((pad, w), jnp.float32)], axis=0)

    @partial(jax.jit, static_argnames=())
    def impl(xin):
        def kern(x_ref, out_ref):
            keys = _float_key(x_ref[:])
            out_ref[:, 0] = _key_to_float(_select_kth(keys, k, w))

        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((xin.shape[0], 1), jnp.float32),
            grid=(xin.shape[0] // row_tile,),
            in_specs=[pl.BlockSpec((row_tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((row_tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES),
            interpret=_interpret(),
        )(xin)[:, 0]

    return impl(xj)[:n]


def _wmedian_kernel(x_ref, w_ref, out_ref, *, total: int):
    """Weighted median: median of each row's values repeated ``w_ref`` times.

    Same 32-step radix bisection as ``_median_kernel``, but ranks count with
    integer multiplicities — so a 20k-gene median whose values collapse to
    ~2·n_windows distinct coverage groups costs only the group width.
    Zero-weight columns are ignored entirely (used for masking).
    """
    keys = _float_key(x_ref[:])
    wts = w_ref[:]  # (1, W) int32, zero = masked out
    zero = jnp.int32(0)
    k_hi = total // 2
    tc = keys.shape[0]
    lo0 = jnp.full((tc, 1), jnp.int32(-(2**31)))
    hi0 = jnp.full((tc, 1), jnp.int32(2**31 - 1))

    def body(_, state):
        lo, hi = state
        mid = (lo & hi) + ((lo ^ hi) >> 1)
        cnt = jnp.sum(jnp.where(keys <= mid, wts, zero), axis=1, keepdims=True)
        go_low = cnt >= (k_hi + 1)
        return jnp.where(go_low, lo, mid + 1), jnp.where(go_low, mid, hi)

    lo, _ = jax.lax.fori_loop(0, 32, body, (lo0, hi0))
    kh = lo  # (tc, 1) key of rank k_hi
    v_hi = _key_to_float(kh[:, 0])
    if total % 2 == 1:
        out_ref[:, 0] = v_hi
    else:
        # lower median: if fewer than k_hi elements are strictly below kh,
        # rank k_hi-1 is kh itself (a duplicate); else the largest key < kh
        NEG = jnp.int32(-(2**31))
        lt = (keys < kh) & (wts > zero)
        cnt_lt = jnp.sum(jnp.where(lt, wts, zero), axis=1)
        max_lt = jnp.max(jnp.where(lt, keys, NEG), axis=1)
        kl = jnp.where(cnt_lt < k_hi, kh[:, 0], max_lt)
        out_ref[:, 0] = (_key_to_float(kl) + v_hi) / 2.0


@partial(jax.jit, static_argnames=("row_tile", "total"))
def _row_wmedian_impl(x, wts, row_tile: int, total: int):
    n, w = x.shape
    return pl.pallas_call(
        partial(_wmedian_kernel, total=total),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        grid=(n // row_tile,),
        in_specs=[
            pl.BlockSpec((row_tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=_interpret(),
    )(x, wts)[:, 0]


def row_median_weighted(x, weights, row_tile: int = 256):
    """Exact per-row weighted median of a 2-D f32 array.

    Equivalent to ``np.median(np.repeat(row, weights))`` per row, for integer
    ``weights`` (shape ``(w,)``); zero weights drop the column.
    """
    n, w = x.shape
    weights = np.asarray(weights, dtype=np.int32)
    total = int(weights.sum())
    if n == 0 or total == 0:
        return jnp.zeros((n,), jnp.float32)
    row_tile = _auto_row_tile(row_tile, n, w)
    pad = (-n) % row_tile
    xj = jnp.asarray(x, jnp.float32)
    if pad:
        xj = jnp.concatenate([xj, jnp.zeros((pad, w), jnp.float32)], axis=0)
    med = _row_wmedian_impl(xj, jnp.asarray(weights.reshape(1, w)), row_tile, total)
    return med[:n]
