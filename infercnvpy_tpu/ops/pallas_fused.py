"""Fused Pallas TPU kernel for the infercnv hot path.

One pass over HBM computes, per cell tile, entirely in VMEM:

1. bounded logFC centering against (ref_min, ref_max) — single-reference
   centering is the special case ref_min == ref_max (identically x - ref)
2. clip to ±lfc_clip
3. the strided pyramid running-window conv on the phase-major packed region
   (statically unrolled multiply-adds over the ``m × s`` taps on the VPU)
4. uniform means for small chromosomes (tail region)
5. the exact per-row median over VALID windows (bitwise radix select — see
   pallas_select.py) and its subtraction
6. per-row sum / sum-of-squares of the median-centered valid windows (the
   inputs to the chunk-scoped noise gate, which runs as a tiny segmented
   reduction outside the kernel)

Compared with the unfused XLA pipeline this removes every intermediate HBM
round-trip: the expression tile is read once, and only the (much smaller)
window matrix is written back.

Outputs are in kernel layout ``[all conv positions | small windows]``; the
caller gathers valid windows into final chromosome order (see
``final_gather_map``) while applying the noise gate — a single cheap pass.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..genome.plan import WindowPlan

__all__ = ["fused_center_smooth_median", "final_gather_map", "kernel_layout_width"]

_MAXKEY = np.int32(2**31 - 1)


def _float_key(x):
    i = jax.lax.bitcast_convert_type(x, jnp.int32)
    return i ^ (jnp.int32(0x7FFFFFFF) & (i >> 31))


def _key_to_float(key):
    i = key ^ (jnp.int32(0x7FFFFFFF) & (key >> 31))
    return jax.lax.bitcast_convert_type(i, jnp.float32)


def _select_kth(keys, k: int):
    tc = keys.shape[0]
    lo0 = jnp.full((tc, 1), jnp.int32(-(2**31)))
    hi0 = jnp.full((tc, 1), jnp.int32(2**31 - 1))

    def body(_, state):
        lo, hi = state
        mid = (lo & hi) + ((lo ^ hi) >> 1)  # overflow-safe signed midpoint
        cnt = jnp.sum((keys <= mid).astype(jnp.int32), axis=1, keepdims=True)
        go_low = cnt >= (k + 1)
        return jnp.where(go_low, lo, mid + 1), jnp.where(go_low, mid, hi)

    lo, hi = jax.lax.fori_loop(0, 32, body, (lo0, hi0))
    return lo[:, 0]


def _conv_region_windows(plan: WindowPlan) -> int:
    """Number of raw conv output positions P (stride-s coordinate)."""
    if not plan.n_reg_windows:
        return 0
    s = plan.step
    m = -(-plan.window_size // s)
    return plan.packed_len // s - m + 1


def kernel_layout_width(plan: WindowPlan) -> int:
    """Width of the kernel's window output: conv positions + small windows."""
    return _conv_region_windows(plan) + plan.n_small


def final_gather_map(plan: WindowPlan) -> np.ndarray:
    """Map final window k -> column in the kernel output layout."""
    P = _conv_region_windows(plan)
    n_reg = plan.n_reg_windows
    src = plan.final_src
    out = np.empty(len(src), np.int32)
    reg = src < n_reg
    if n_reg:
        out[reg] = plan.conv_gather[src[reg]]
    out[~reg] = P + (src[~reg] - n_reg)
    return out


def _window_validity(plan: WindowPlan) -> np.ndarray:
    P = _conv_region_windows(plan)
    mask = np.zeros(P + plan.n_small, dtype=np.float32)
    if plan.n_reg_windows:
        mask[plan.conv_gather] = 1.0
    mask[P:] = 1.0
    return mask


def _make_kernel(plan: WindowPlan, lfc_clip: float, n_windows: int):
    s = plan.step
    m = -(-plan.window_size // s)
    Q = plan.packed_len // s
    P = Q - m + 1 if plan.n_reg_windows else 0
    pyr = np.zeros(m * s, dtype=np.float64)
    pyr[: plan.window_size] = plan.pyramid
    small_counts = [int(c) for c in plan.small_counts]
    k_hi = n_windows // 2
    k_lo = k_hi - 1
    odd = n_windows % 2 == 1

    def kernel(x_ref, ref_ref, mask_ref, out_ref, stats_ref):
        x = x_ref[:]
        rmin = ref_ref[0:1, :]
        rmax = ref_ref[1:2, :]
        xc = jnp.where(x > rmax, x - rmax, jnp.where(x < rmin, x - rmin, jnp.zeros_like(x)))
        xc = jnp.clip(xc, -lfc_clip, lfc_clip)

        parts = []
        if P:
            x3 = xc[:, : s * Q].reshape(xc.shape[0], s, Q)
            acc = jnp.zeros((xc.shape[0], P), jnp.float32)
            # z-form with affine-tap factoring: within tap u the pyramid
            # weights w[u*s+t] are affine in the phase t with slope ±1
            # (w = min(r, n+1-r)), so z_u collapses to a_u*B ± T where
            #   B = Σ_t x3[t]   and   T = Σ_t t·x3[t]
            # are shared across ALL taps — ~3 VPU ops per tap at full width
            # instead of s multiply-adds.  Non-affine taps (the peak tap when
            # s doesn't split it, the zero-padded last tap) fall back to
            # per-phase multiply-adds.
            def tap_affine(u):
                ws = [float(pyr[u * s + t]) for t in range(s)]
                b = ws[1] - ws[0] if s > 1 else 0.0
                if all(ws[t] == ws[0] + b * t for t in range(s)):
                    return ws[0], b
                return None

            need_shared = any(tap_affine(u) is not None and s > 1 for u in range(m))
            if need_shared:
                B = x3[:, 0, :]
                T = None
                for t in range(1, s):
                    xt = x3[:, t, :]
                    B = B + xt
                    T = xt * float(t) if T is None else T + xt * float(t)
                if T is None:
                    T = jnp.zeros_like(B)
            for u in range(m):
                aff = tap_affine(u) if s > 1 else None
                if aff is not None:
                    a, b = aff
                    if a == 0.0 and b == 0.0:
                        continue
                    z = B * a if a != 0.0 else None
                    if b == 1.0:
                        z = T if z is None else z + T
                    elif b == -1.0:
                        z = -T if z is None else z - T
                    elif b != 0.0:
                        zt = T * b
                        z = zt if z is None else z + zt
                else:
                    z = None
                    for t in range(s):
                        w = float(pyr[u * s + t])
                        if w != 0.0:
                            zt = x3[:, t, :] * w
                            z = zt if z is None else z + zt
                if z is not None:
                    acc = acc + z[:, u : u + P]
            parts.append(acc)
        off = s * Q
        for g in small_counts:
            seg = xc[:, off : off + g]
            parts.append(jnp.mean(seg, axis=1, keepdims=True))
            off += g
        win = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

        valid = mask_ref[0:1, :] > 0
        keys = jnp.where(valid, _float_key(win), _MAXKEY)
        v_hi = _key_to_float(_select_kth(keys, k_hi))
        if odd:
            med = v_hi
        else:
            med = (_key_to_float(_select_kth(keys, k_lo)) + v_hi) / 2.0
        xr = win - med[:, None]
        out_ref[:] = xr
        xv = jnp.where(valid, xr, jnp.zeros_like(xr))
        stats_ref[:] = jnp.concatenate(
            [
                jnp.sum(xv, axis=1, keepdims=True),
                jnp.sum(xv * xv, axis=1, keepdims=True),
                med[:, None],
                jnp.zeros((xv.shape[0], 5), jnp.float32),
            ],
            axis=1,
        )

    return kernel


@partial(jax.jit, static_argnames=("plan_key", "lfc_clip", "row_tile"))
def _fused_impl(x, ref2, mask, plan_key, lfc_clip, row_tile):
    plan, n_windows = plan_key.plan, plan_key.plan.n_windows
    n, wt = x.shape
    pw = mask.shape[1]
    kernel = _make_kernel(plan, lfc_clip, n_windows)
    out, stats = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, pw), jnp.float32),
            jax.ShapeDtypeStruct((n, 8), jnp.float32),
        ),
        grid=(n // row_tile,),
        in_specs=[
            pl.BlockSpec((row_tile, wt), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, wt), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pw), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((row_tile, pw), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(x, ref2, mask)
    return out, stats


class _PlanKey:
    """Hashable wrapper so the plan can be a static jit argument."""

    def __init__(self, plan: WindowPlan):
        self.plan = plan

    def __hash__(self):
        return id(self.plan)

    def __eq__(self, other):
        return isinstance(other, _PlanKey) and other.plan is self.plan


def fused_center_smooth_median(x, ref_min_max, plan: WindowPlan, *, lfc_clip: float, row_tile: int = 64):
    """Run the fused kernel.

    x            — (cells, packed_width) f32, phase-major packed (cells padded
                   to a multiple of row_tile by the caller)
    ref_min_max  — (2, packed_width) f32: per-gene min / max of category means
                   (equal rows for a single reference)
    Returns ``(x_res_kernel_layout, row_sum, row_sumsq, med)``.
    """
    mask = jnp.asarray(_window_validity(plan))[None, :]
    out, stats = _fused_impl(x, ref_min_max, mask, _PlanKey(plan), float(lfc_clip), int(row_tile))
    return out, stats[:, 0], stats[:, 1], stats[:, 2]
