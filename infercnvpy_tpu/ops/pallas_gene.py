"""Pallas TPU kernel: per-gene CNV back-projection in one HBM pass.

The reference computes per-gene values with a pure-Python dict loop over
windows and documents the mode as 10-100x slower than the default
(reference: tl/_infercnv.py:247-291, docstring :84-89).  Here the whole
epilogue — group means, exact weighted gene median, median subtraction,
noise gate, and the (cells × genes) expansion — runs inside ONE Pallas
kernel per cell tile:

1. genes sharing a (first, last) covering-window range have identical
   values, so the gene axis collapses to ~n_windows *coverage groups*;
2. an in-VMEM prefix sum over the window axis (log-shift ``pltpu.roll``
   passes — Mosaic has no cumsum primitive) turns each group mean into a
   difference of two prefix elements;
3. both prefix lookups and the final gene expansion are *banded gathers*:
   the index vectors are monotone, so every 128-wide output block draws
   from a statically-known narrow band of source columns, which Mosaic's
   lane-local ``take_along_axis`` can gather (a general cross-lane gather
   does not lower on TPU; XLA's fallback gather runs at ~130 GB/s vs the
   ~800 GB/s this kernel sustains);
4. the exact gene median is a *weighted* median over group values
   (weight = genes per group) via the interpolated radix select shared
   with the fused window kernel.

Gene columns are emitted in group-sorted order (``covered_sorted`` maps a
device column back to its used-gene index); the host reorders during the
NaN-fill reindex it performs anyway.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..genome.plan import WindowPlan
from .pallas_fused import _float_key, _key_to_float, _select_kth_multi

__all__ = ["gene_projection_data", "gene_project", "GeneProjectionData"]

_LANE = 128
_MAXKEY = np.int32(2**31 - 1)
_MINKEY = np.int32(-(2**31))


@dataclass(frozen=True)
class GeneProjectionData:
    """Static coverage-group structure of a window plan (host-precomputed)."""

    n_windows: int
    g_lo: np.ndarray  #: (n_groups,) first covering window per group
    g_hi: np.ndarray  #: (n_groups,) last covering window per group
    g_counts: np.ndarray  #: (n_groups,) genes per group
    gidx_sorted: np.ndarray  #: (n_covered,) group of each device gene column (monotone)
    covered_sorted: np.ndarray  #: (n_covered,) used-gene index of each device column
    total: int  #: number of covered genes (weighted rank count)


#: id(plan) -> (plan, gpd).  The plan object itself is stored in the value so
#: it stays alive for the lifetime of the cache entry — otherwise a
#: garbage-collected plan could hand its id to a NEW plan, which would then
#: silently receive the old plan's projection data.
_gpd_cache: dict = {}


def gene_projection_data(plan: WindowPlan) -> GeneProjectionData:
    key = id(plan)
    hit = _gpd_cache.get(key)
    if hit is not None:
        assert hit[0] is plan
        return hit[1]
    n_win = plan.n_windows
    lo_np, hi_np = plan.gene_win_lo, plan.gene_win_hi
    covered = np.flatnonzero(lo_np >= 0)
    enc = lo_np[covered].astype(np.int64) * (n_win + 1) + hi_np[covered]
    uniq, inv = np.unique(enc, return_inverse=True)
    order = np.argsort(inv, kind="stable")
    gpd = GeneProjectionData(
        n_windows=n_win,
        g_lo=(uniq // (n_win + 1)).astype(np.int32),
        g_hi=(uniq % (n_win + 1)).astype(np.int32),
        g_counts=np.bincount(inv, minlength=len(uniq)).astype(np.int32),
        gidx_sorted=inv[order].astype(np.int32),
        covered_sorted=covered[order].astype(np.int64),
        total=int(len(covered)),
    )
    _gpd_cache[key] = (plan, gpd)
    return gpd


def _pad_to(a: np.ndarray, width: int, fill) -> np.ndarray:
    out = np.full(width, fill, dtype=a.dtype)
    out[: len(a)] = a
    return out


def _band_plan(idx: np.ndarray, n_blocks: int) -> list[tuple[int, int]]:
    """(base_block, n_aligned_blocks) per 128-wide block of a monotone index."""
    plans = []
    for j in range(n_blocks):
        blk = idx[j * _LANE : (j + 1) * _LANE]
        base = int(blk.min()) // _LANE
        nblk = int(blk.max()) // _LANE - base + 1
        plans.append((base, nblk))
    return plans


def _bgather(src, idx_abs, base: int, nblk: int):
    """Gather src[:, idx_abs] where idx_abs (1, 128) lies in
    [128*base, 128*(base+nblk)) — nblk lane-local gathers + selects."""
    rows = src.shape[0]
    loc = idx_abs - jnp.int32(_LANE * base)  # (1, 128)
    out = None
    for b in range(nblk):
        blk = src[:, _LANE * (base + b) : _LANE * (base + b + 1)]
        l_b = jnp.clip(loc - jnp.int32(_LANE * b), 0, _LANE - 1)
        g = jnp.take_along_axis(blk, jnp.broadcast_to(l_b, (rows, _LANE)), axis=1)
        out = g if out is None else jnp.where(loc >= jnp.int32(_LANE * b), g, out)
    return out


def _make_gene_kernel(
    gpd: GeneProjectionData,
    *,
    gate: bool,
    wp: int,
    gp: int,
    cp: int,
    interpret: bool,
    force_roll: bool = False,
    debug_skip: tuple = (),
):
    n_win = gpd.n_windows
    total = gpd.total
    k_hi = total // 2
    odd = total % 2 == 1
    ghi_pad = _pad_to(gpd.g_hi, gp, gpd.g_hi[-1])
    glo_pad = _pad_to(gpd.g_lo, gp, gpd.g_lo[-1])
    gix_pad = _pad_to(gpd.gidx_sorted, cp, gpd.gidx_sorted[-1])
    h_plan = _band_plan(ghi_pad, gp // _LANE)
    l_plan = _band_plan(np.maximum(glo_pad - 1, 0), gp // _LANE)
    x_plan = _band_plan(gix_pad, cp // _LANE)

    def kernel(x_ref, thr_ref, ghi_ref, glo_ref, wts_ref, gix_ref, out_ref):
        x = x_ref[:]
        # prefix sum along lanes: log-shift rolls (Mosaic has no cumsum).
        # Interpret mode substitutes jnp.cumsum for speed; force_roll runs the
        # exact roll formulation shipped to hardware (roll-parity tests).
        if "prefix" in debug_skip:  # pragma: no cover - profiling only
            c = x
        elif interpret and not force_roll:
            c = jnp.cumsum(x, axis=1)
        else:
            col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            c = x
            sh = 1
            while sh < wp:
                c = c + jnp.where(col >= sh, pltpu.roll(c, sh, 1), jnp.float32(0.0))
                sh *= 2

        # group means: (prefix[hi] - prefix[lo-1]) / (hi - lo + 1)
        upieces = []
        nbw = wp // _LANE
        for j in range(gp // _LANE):
            hi_idx = ghi_ref[0:1, j * _LANE : (j + 1) * _LANE]
            lo_idx = glo_ref[0:1, j * _LANE : (j + 1) * _LANE]
            if "gmeans" in debug_skip:  # pragma: no cover - profiling only
                jj = (j % nbw) * _LANE
                upieces.append(c[:, jj : jj + _LANE])
                continue
            ph = _bgather(c, hi_idx, *h_plan[j])
            lom1 = lo_idx - 1
            plo = _bgather(c, jnp.maximum(lom1, 0), *l_plan[j])
            plo = jnp.where(lom1 >= 0, plo, jnp.float32(0.0))
            cnt = (hi_idx - lo_idx + 1).astype(jnp.float32)
            upieces.append((ph - plo) / cnt)
        uv = jnp.concatenate(upieces, axis=1) if len(upieces) > 1 else upieces[0]

        # exact weighted median over group values (weight = genes per group)
        keys = _float_key(uv)
        wts = wts_ref[0:1, :]
        valid = wts > 0
        keys = jnp.where(valid, keys, _MAXKEY)
        lo0 = jnp.min(keys, axis=1)[:, None]
        hi0 = jnp.max(jnp.where(valid, keys, _MINKEY), axis=1)[:, None]
        if "wmedian" in debug_skip:  # pragma: no cover - profiling only
            kh = lo0[:, 0]
        else:
            kh = _select_kth_multi([keys], k_hi, bounds=(lo0, hi0), n_valid=total, weights=[wts])
        v_hi = _key_to_float(kh)
        if odd or "wmedian" in debug_skip:
            med = v_hi
        else:
            lt = keys < kh[:, None]
            cnt_lt = jnp.sum(jnp.where(lt, wts, jnp.int32(0)), axis=1)
            max_lt = jnp.max(jnp.where(lt, keys, _MINKEY), axis=1)
            kl = jnp.where(cnt_lt < k_hi, kh, max_lt)
            med = (_key_to_float(kl) + v_hi) / 2.0

        u_res = uv - med[:, None]
        if gate:
            t = thr_ref[:, 0:1]
            u_res = jnp.where(jnp.abs(u_res) < t, jnp.float32(0.0), u_res)

        # expansion to gene columns (group-sorted order): banded gathers
        ngb = gp // _LANE
        for q in range(cp // _LANE):
            if "expand" in debug_skip:  # pragma: no cover - profiling only
                qq = (q % ngb) * _LANE
                out_ref[:, q * _LANE : (q + 1) * _LANE] = u_res[:, qq : qq + _LANE]
                continue
            gi = gix_ref[0:1, q * _LANE : (q + 1) * _LANE]
            out_ref[:, q * _LANE : (q + 1) * _LANE] = _bgather(u_res, gi, *x_plan[q])

    return kernel


class _GpdKey:
    """Hashable wrapper so the projection data can be a static jit arg."""

    def __init__(self, gpd: GeneProjectionData):
        self.gpd = gpd

    def __hash__(self):
        return id(self.gpd)

    def __eq__(self, other):
        return isinstance(other, _GpdKey) and other.gpd is self.gpd


@partial(jax.jit, static_argnames=("gpd_key", "gate", "row_tile", "force_roll", "debug_skip"))
def _gene_project_impl(x_res, thr8, gpd_key, gate, row_tile, force_roll=False, debug_skip=()):
    gpd = gpd_key.gpd
    n, w = x_res.shape
    if n % row_tile != 0:
        raise ValueError(f"gene_project: cell count {n} must be a multiple of row_tile={row_tile} (pad the input)")
    wp = -(-w // _LANE) * _LANE
    gp = -(-len(gpd.g_lo) // _LANE) * _LANE
    cp = -(-gpd.total // _LANE) * _LANE
    interpret = jax.default_backend() == "cpu"
    if wp != w:
        x_res = jnp.pad(x_res, ((0, 0), (0, wp - w)))
    kernel = _make_gene_kernel(
        gpd, gate=gate, wp=wp, gp=gp, cp=cp, interpret=interpret, force_roll=force_roll, debug_skip=debug_skip
    )
    ghi = jnp.asarray(_pad_to(gpd.g_hi, gp, gpd.g_hi[-1]).reshape(1, -1))
    glo = jnp.asarray(_pad_to(gpd.g_lo, gp, gpd.g_lo[-1]).reshape(1, -1))
    wts = jnp.asarray(_pad_to(gpd.g_counts, gp, np.int32(0)).reshape(1, -1))
    gix = jnp.asarray(_pad_to(gpd.gidx_sorted, cp, gpd.gidx_sorted[-1]).reshape(1, -1))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, cp), jnp.float32),
        grid=(n // row_tile,),
        in_specs=[
            pl.BlockSpec((row_tile, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(x_res, thr8, ghi, glo, wts, gix)


def gene_project(
    x_res,
    thr8,
    gpd: GeneProjectionData,
    *,
    gate: bool,
    row_tile: int = 256,
    force_roll: bool = False,
    debug_skip: tuple = (),
):
    """Per-gene back-projection of the median-centered window matrix.

    x_res — (cells, n_windows) f32, PRE-noise-gate, cells a multiple of
    ``row_tile``; thr8 — (cells, 8) f32, per-row gate threshold in column 0
    (ignored when ``gate=False``).  Returns the (cells, n_covered) per-gene
    matrix in group-sorted column order (``gpd.covered_sorted``), already
    median-subtracted and gated.
    """
    out = _gene_project_impl(x_res, thr8, _GpdKey(gpd), bool(gate), int(row_tile), bool(force_roll), tuple(debug_skip))
    return out[:, : gpd.total]
