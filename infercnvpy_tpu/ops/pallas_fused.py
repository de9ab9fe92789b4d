"""Fused Pallas TPU kernel for the infercnv hot path.

One pass over HBM computes, per cell tile, entirely in VMEM:

1. bounded logFC centering against (ref_min, ref_max) — single-reference
   centering is the special case ref_min == ref_max (identically x - ref)
2. clip to ±lfc_clip
3. the strided pyramid running-window conv on the phase-major packed region
   (affine-tap factored multiply-adds on the VPU — see ``_make_kernel``)
4. uniform means for small chromosomes via one tiny constant matmul
5. the exact per-row median over the real windows (bitwise radix select —
   see pallas_select.py) and its subtraction
6. per-row sum / sum-of-squares of the median-centered windows (the inputs
   to the chunk-scoped noise gate, which runs as a tiny segmented reduction
   outside the kernel)

With no small chromosomes the final chromosome-ordered window matrix is also
assembled IN-KERNEL from static slices of the conv accumulator and written
once; with small chromosomes the kernel writes the raw [conv | small] blocks
and the caller assembles in XLA (Mosaic cannot lane-concat narrow vectors at
mismatched offsets).  Either way the expression tile is read from HBM once
and only the (much smaller) window matrix is written back.

Replaces the reference's per-chunk numpy pipeline (reference:
tl/_infercnv.py:411-457 — center/clip/convolve/median/std over one chunk).
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
    return _select_kth_multi([keys], k)


def _select_kth_multi(blocks, k: int, bounds=None, n_valid: int | None = None, weights=None, mxu=False):
    """Rank-k selection over the row-wise union of several key blocks.

    Counting over separate blocks avoids materializing their concatenation
    (Mosaic can't always relayout narrow odd-offset vectors for a concat).

    The binary search is seeded with per-row [min, max] bounds (``bounds``
    overrides, for masked blocks) and runs as a while_loop: real data spans
    a fraction of the 32-bit key space, so convergence takes ~16-22
    iterations instead of a fixed 32.  (A Floyd-Rivest-style interpolated
    probe was tried and measured SLOWER here: the float-bit key scale is
    sign-log, so counts interpolate badly for near-zero-centered data —
    probes land far from the target rank and the alternating safeguard
    doubles the pass count.  See docs/roofline.md.)

    ``weights`` (optional, one (1, W) int32 per block) turns counts into
    weighted ranks — used for the grouped gene median (``n_valid`` is
    accepted for API symmetry and unused by the bisection).
    """
    del n_valid
    if bounds is not None:
        lo0, hi0 = bounds
    else:
        lo0 = jnp.min(jnp.stack([jnp.min(b, axis=1) for b in blocks]), axis=0)[:, None]
        hi0 = jnp.max(jnp.stack([jnp.max(b, axis=1) for b in blocks]), axis=0)[:, None]

    def count_le(m):
        if mxu and weights is None:
            # offload the row reduction to the (otherwise idle) MXU: the 0/1
            # mask is exact in bf16 and the MXU accumulates in f32, so the
            # count is exact for any block width < 2^24.
            tot = None
            for b in blocks:
                mask = (b <= m).astype(jnp.bfloat16)
                ones = jnp.ones((b.shape[1], 128), jnp.bfloat16)
                c = jax.lax.dot_general(
                    mask, ones, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )[:, 0:1].astype(jnp.int32)
                tot = c if tot is None else tot + c
            return tot
        if weights is None:
            return sum(jnp.sum((b <= m).astype(jnp.int32), axis=1, keepdims=True) for b in blocks)
        return sum(
            jnp.sum(jnp.where(b <= m, w, jnp.int32(0)), axis=1, keepdims=True)
            for b, w in zip(blocks, weights)
        )

    def cond(state):
        lo, hi = state
        return jnp.any(lo < hi)

    def body(state):
        lo, hi = state
        mid = (lo & hi) + ((lo ^ hi) >> 1)  # overflow-safe signed midpoint
        cnt = count_le(mid).astype(jnp.int32)
        go_low = cnt >= (k + 1)
        return jnp.where(go_low, lo, mid + 1), jnp.where(go_low, mid, hi)

    lo, hi = jax.lax.while_loop(cond, body, (lo0, hi0))
    return lo[:, 0]


def _conv_region_windows(plan: WindowPlan) -> int:
    """Number of raw conv output positions P (stride-s coordinate)."""
    if not plan.n_reg_windows:
        return 0
    s = plan.step
    m = -(-plan.window_size // s)
    return plan.packed_len // s - m + 1


def kernel_layout_width(plan: WindowPlan) -> int:
    """Width of the raw kernel layout: conv positions + small windows."""
    return _conv_region_windows(plan) + plan.n_small


def final_gather_map(plan: WindowPlan) -> np.ndarray:
    """Map final window k -> column in the raw [conv | small] layout."""
    P = _conv_region_windows(plan)
    n_reg = plan.n_reg_windows
    src = plan.final_src
    out = np.empty(len(src), np.int32)
    reg = src < n_reg
    if n_reg:
        out[reg] = plan.conv_gather[src[reg]]
    out[~reg] = P + (src[~reg] - n_reg)
    return out


def _assembly_runs(plan: WindowPlan) -> list[tuple[int, int]]:
    """Maximal (src_start, length) runs of the final-order assembly.

    ``final_gather_map`` is piecewise consecutive (one run per chromosome,
    adjacent small chromosomes merge), so the final window matrix is built
    from a handful of static slice-copies instead of a lane gather.
    """
    gmap = final_gather_map(plan)
    runs: list[tuple[int, int]] = []
    i = 0
    while i < len(gmap):
        j = i + 1
        while j < len(gmap) and gmap[j] == gmap[j - 1] + 1:
            j += 1
        runs.append((int(gmap[i]), j - i))
        i = j
    return runs


def _conv_validity(plan: WindowPlan) -> np.ndarray:
    """(1, P) mask: 1 where the raw conv position is a real window."""
    P = _conv_region_windows(plan)
    mask = np.zeros((1, P), dtype=np.float32)
    if plan.n_reg_windows:
        mask[0, plan.conv_gather] = 1.0
    return mask


def _small_mean_matrix(plan: WindowPlan) -> np.ndarray:
    """(S+1, n_small) operand: rows 0..S-1 = 0/1 gene->chromosome incidence
    (so ``xs @ M`` is the per-chromosome SUM on the MXU), last row = gene
    counts (the kernel divides by it — same rounding as a mean)."""
    S = len(plan.small_src)
    out = np.zeros((S + 1, plan.n_small), dtype=np.float32)
    out[np.arange(S), plan.small_seg] = 1.0
    out[S, :] = plan.small_counts.astype(np.float32)
    return out


def _make_kernel(plan: WindowPlan, lfc_clip: float, n_ref: int, debug_skip: tuple = (), debug_variants: tuple = ()):
    s = plan.step
    m = -(-plan.window_size // s)
    Q = plan.packed_len // s
    P = Q - m + 1 if plan.n_reg_windows else 0
    n_windows = plan.n_windows
    n_small = plan.n_small
    S_small = len(plan.small_src)
    # UNNORMALIZED pyramid weights min(r, n+1-r): small exact integers in
    # float64, so the per-tap affinity test below is an exact comparison.
    # The 1/sum normalization is applied ONCE to the whole conv accumulator.
    pyr = np.zeros(m * s, dtype=np.float64)
    r = np.arange(1, plan.window_size + 1)
    pyr[: plan.window_size] = np.minimum(r, r[::-1])
    inv_sum = 1.0 / plan.pyramid_sum
    runs = _assembly_runs(plan)
    k_hi = n_windows // 2
    odd = n_windows % 2 == 1
    # With no small chromosomes every assembly piece is a slice of the one
    # conv accumulator — a lane concat Mosaic handles — so the final-order
    # window matrix is built in-kernel and written once.  With small
    # chromosomes the pieces mix tensors/offsets (a Mosaic relayout failure),
    # so the kernel writes the raw [conv | small] blocks and the caller
    # assembles in XLA.
    inkernel_assembly = n_small == 0

    def kernel(x_ref, ref_ref, *refs):
        aux = list(refs)
        mask_ref = aux.pop(0) if (P and not inkernel_assembly) else None
        m_ref = aux.pop(0) if n_small else None
        if inkernel_assembly:
            out_ref, stats_ref = aux
            conv_ref = small_ref = None
        else:
            conv_ref = aux.pop(0) if P else None
            small_ref = aux.pop(0) if n_small else None
            stats_ref = aux.pop(0)
        x = x_ref[:]
        if "center" in debug_skip:  # pragma: no cover - profiling only
            xc = x
        elif n_ref == 1:
            xc = jnp.clip(x - ref_ref[0:1, :], -lfc_clip, lfc_clip)
        else:
            # bounded logFC == x - clip(x, ref_min, ref_max): 3 VPU ops
            # instead of the literal two-nested-where formulation
            rmin = ref_ref[0:1, :]
            rmax = ref_ref[1:2, :]
            xc = jnp.clip(x - jnp.clip(x, rmin, rmax), -lfc_clip, lfc_clip)

        acc = None
        if P and "conv" not in debug_skip:
            x3 = xc[:, : s * Q].reshape(xc.shape[0], s, Q)
            # z-form with affine-tap factoring: within tap u the unnormalized
            # pyramid weights w[u*s+t] = min(r, n+1-r) are affine in the phase
            # t with slope ±1, so z_u collapses to a_u*B ± T where
            #   B = Σ_t x3[t]   and   T = Σ_t t·x3[t]
            # are shared across ALL taps — ~3 VPU ops per tap at full width
            # instead of s multiply-adds.  Non-affine taps (the zero-padded
            # last tap when s doesn't divide n) fall back to per-phase
            # multiply-adds with the same unnormalized weights.
            def tap_affine(u):
                ws = [float(pyr[u * s + t]) for t in range(s)]
                b = ws[1] - ws[0] if s > 1 else 0.0
                if all(ws[t] == ws[0] + b * t for t in range(s)):
                    return ws[0], b
                return None

            affine = {u: tap_affine(u) if s > 1 else None for u in range(m)}
            n_affine = sum(1 for a in affine.values() if a is not None and a != (0.0, 0.0))
            # a lone affine tap doesn't amortize the shared B/T pass
            use_shared = s > 1 and n_affine >= 2
            if not use_shared:
                affine = dict.fromkeys(range(m))
            else:
                # suffix-sum build: S_t = Σ_{τ>=t} x3[τ] gives both
                #   B = S_0   and   T = Σ_{t>=1} S_t
                # in 3(s-1) adds and zero multiplies
                suf = x3[:, s - 1, :]
                T = None
                for t in range(s - 2, -1, -1):
                    if T is None:
                        T = suf
                    else:
                        T = T + suf
                    suf = suf + x3[:, t, :]
                B = suf
                if T is None:
                    T = jnp.zeros_like(B)
            for u in range(m):
                if "bt_only" in debug_skip:  # pragma: no cover - profiling only
                    break
                aff = affine[u]
                if aff is not None:
                    a, b = aff
                    if a == 0.0 and b == 0.0:
                        continue
                    if a == 1.0:
                        z = B
                    elif a != 0.0:
                        z = B * a
                    else:
                        z = None
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
                    uu = 0 if "noshift" in debug_skip else u  # pragma: no cover
                    zs = z[:, uu : uu + P]
                    acc = zs if acc is None else acc + zs
            if acc is not None:
                acc = acc * jnp.float32(inv_sum)
        if acc is None:
            acc = jnp.zeros((xc.shape[0], max(P, 1)), jnp.float32)

        # small-chromosome uniform means: ONE tiny constant matmul on the MXU
        # (a per-column mean loop would produce width-1 vectors whose
        # concatenation Mosaic cannot relayout)
        small_mat = None
        if n_small:
            xs = xc[:, s * Q : s * Q + S_small]
            sums = jax.lax.dot_general(
                xs,
                m_ref[:S_small, :],
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )
            small_mat = sums / m_ref[S_small : S_small + 1, :]

        if inkernel_assembly:
            # final chromosome-ordered window matrix from same-tensor slices
            pieces = [acc[:, src : src + ln] for src, ln in runs]
            win = jnp.concatenate(pieces, axis=1) if len(pieces) > 1 else pieces[0]
            blocks = [_float_key(win)]
        else:
            # exact median over the n_windows real windows, counting jointly
            # over the [conv | small] blocks — invalid (cross-boundary) conv
            # positions are masked to +inf keys; no in-kernel concatenation
            blocks = []
            if P:
                blocks.append(jnp.where(mask_ref[0:1, :] > 0, _float_key(acc), _MAXKEY))
            if n_small:
                blocks.append(_float_key(small_mat))
        if "median" in debug_skip:  # pragma: no cover - profiling only
            med = jnp.zeros((x.shape[0],), jnp.float32)
        else:
            bounds = None
            if not inkernel_assembly:
                # masked blocks hold +MAXKEY at invalid positions — compute
                # the search seed from the VALID keys only
                NEG0 = jnp.int32(-(2**31))
                lo0 = jnp.min(jnp.stack([jnp.min(b, axis=1) for b in blocks]), axis=0)[:, None]
                his = []
                for bi, b in enumerate(blocks):
                    if bi == 0 and P:
                        his.append(jnp.max(jnp.where(mask_ref[0:1, :] > 0, b, NEG0), axis=1))
                    else:
                        his.append(jnp.max(b, axis=1))
                hi0 = jnp.max(jnp.stack(his), axis=0)[:, None]
                bounds = (lo0, hi0)
            # "mxu_count" is a VARIANT (alternative implementation), not a stage
            # skip — it lives in debug_variants so enabling reads as enabling
            kh = _select_kth_multi(blocks, k_hi, bounds, n_valid=n_windows, mxu="mxu_count" in debug_variants)
            v_hi = _key_to_float(kh)
            if odd:
                med = v_hi
            else:
                # lower median from the upper one in 2 passes instead of a
                # second 32-pass radix descent: it's v_hi itself when v_hi
                # also occupies rank k_hi-1 (duplicates), else the largest
                # key strictly below v_hi
                NEG = jnp.int32(-(2**31))
                cnt_lt = None
                max_lt = None
                for b in blocks:
                    lt = b < kh[:, None]
                    c = jnp.sum(lt.astype(jnp.int32), axis=1)
                    mx = jnp.max(jnp.where(lt, b, NEG), axis=1)
                    cnt_lt = c if cnt_lt is None else cnt_lt + c
                    max_lt = mx if max_lt is None else jnp.maximum(max_lt, mx)
                kl = jnp.where(cnt_lt < k_hi, kh, max_lt)
                med = (_key_to_float(kl) + v_hi) / 2.0

        # median-centered outputs (full-block writes only) + noise-gate
        # sum / sum-of-squares over the valid windows
        if inkernel_assembly:
            xr = win - med[:, None]
            out_ref[:] = xr
            rs = jnp.sum(xr, axis=1, keepdims=True)
            rsq = jnp.sum(xr * xr, axis=1, keepdims=True)
        else:
            rs = None
            rsq = None
            if P:
                xr_c = acc - med[:, None]
                conv_ref[:] = xr_c
                xv = xr_c * mask_ref[0:1, :]
                rs = jnp.sum(xv, axis=1, keepdims=True)
                rsq = jnp.sum(xv * xr_c, axis=1, keepdims=True)
            if n_small:
                xr_s = small_mat - med[:, None]
                small_ref[:] = xr_s
                s1 = jnp.sum(xr_s, axis=1, keepdims=True)
                s2 = jnp.sum(xr_s * xr_s, axis=1, keepdims=True)
                rs = s1 if rs is None else rs + s1
                rsq = s2 if rsq is None else rsq + s2
        stats_ref[:, 0:1] = rs
        stats_ref[:, 1:2] = rsq
        stats_ref[:, 2:3] = med[:, None]
        stats_ref[:, 3:8] = jnp.zeros((x.shape[0], 5), jnp.float32)

    return kernel


@partial(jax.jit, static_argnames=("plan_key", "lfc_clip", "n_ref", "row_tile", "debug_skip", "debug_variants"))
def _fused_impl(x, ref2, plan_key, lfc_clip, n_ref, row_tile, debug_skip=(), debug_variants=()):
    plan = plan_key.plan
    n, wt = x.shape
    pw = plan.n_windows
    kernel = _make_kernel(plan, lfc_clip, n_ref, debug_skip, debug_variants)
    operands = [x, ref2]
    in_specs = [
        pl.BlockSpec((row_tile, wt), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, wt), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    P = _conv_region_windows(plan)
    inkernel_assembly = plan.n_small == 0
    if P and not inkernel_assembly:
        operands.append(jnp.asarray(_conv_validity(plan)))
        in_specs.append(pl.BlockSpec((1, P), lambda i: (0, 0), memory_space=pltpu.VMEM))
    if plan.n_small:
        mmat = jnp.asarray(_small_mean_matrix(plan))
        operands.append(mmat)
        in_specs.append(pl.BlockSpec(mmat.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    out_shape = []
    out_specs = []
    if inkernel_assembly:
        out_shape.append(jax.ShapeDtypeStruct((n, pw), jnp.float32))
        out_specs.append(pl.BlockSpec((row_tile, pw), lambda i: (i, 0), memory_space=pltpu.VMEM))
    else:
        if P:
            out_shape.append(jax.ShapeDtypeStruct((n, P), jnp.float32))
            out_specs.append(pl.BlockSpec((row_tile, P), lambda i: (i, 0), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((n, plan.n_small), jnp.float32))
        out_specs.append(pl.BlockSpec((row_tile, plan.n_small), lambda i: (i, 0), memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((n, 8), jnp.float32))
    out_specs.append(pl.BlockSpec((row_tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=(n // row_tile,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(*operands)
    outs = list(outs)
    if inkernel_assembly:
        return outs[0], outs[1]
    conv = outs.pop(0) if P else None
    small = outs.pop(0)
    stats = outs.pop(0)

    # final chromosome-order assembly: static slice-concat in XLA (fuses into
    # the caller's noise-gate pass; Mosaic can't do narrow lane concats)
    pieces = []
    for src, ln in _assembly_runs(plan):
        if src < P:
            pieces.append(conv[:, src : src + ln])
        else:
            pieces.append(small[:, src - P : src - P + ln])
    win = jnp.concatenate(pieces, axis=1) if len(pieces) > 1 else pieces[0]
    assert win.shape[1] == pw
    return win, stats


class _PlanKey:
    """Hashable wrapper so the plan can be a static jit argument."""

    def __init__(self, plan: WindowPlan):
        self.plan = plan

    def __hash__(self):
        return id(self.plan)

    def __eq__(self, other):
        return isinstance(other, _PlanKey) and other.plan is self.plan


def fused_center_smooth_median(
    x,
    ref_min_max,
    plan: WindowPlan,
    *,
    lfc_clip: float,
    n_ref: int = 2,
    row_tile: int = 256,
    debug_skip: tuple = (),
    debug_variants: tuple = (),
):
    """Run the fused kernel.

    x            — (cells, packed_width) f32, phase-major packed (cells padded
                   to a multiple of row_tile by the caller)
    ref_min_max  — (2, packed_width) f32: per-gene min / max of category means
                   (equal rows for a single reference)
    n_ref        — number of reference categories; 1 selects the cheaper
                   single-baseline centering (rows of ref_min_max must be equal)
    Returns ``(x_res_final_order, row_sum, row_sumsq, med)`` — the window
    matrix is already in final chromosome order (pre noise gate).
    """
    out, stats = _fused_impl(
        x, ref_min_max, _PlanKey(plan), float(lfc_clip), int(n_ref), int(row_tile), tuple(debug_skip),
        tuple(debug_variants)
    )
    return out, stats[:, 0], stats[:, 1], stats[:, 2]
