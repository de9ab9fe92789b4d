"""The CNV smoothing pipeline as one functional JAX program.

Numerics contract (must match reference tl/_infercnv.py:411-457):

1. center against the reference baseline — single reference: plain difference;
   multiple references: *bounded* logFC (values between the per-gene min/max of
   the category means map to 0) (reference :419-434)
2. clip to ±lfc_clip (reference :435-436)
3. pyramidally-weighted running mean along genomic position, per chromosome,
   every ``step``-th window (reference :179-244,301-343) — here ONE strided
   convolution over the packed gene axis (see genome.plan) + a tiny segment
   mean for small chromosomes
4. per-cell median centering (reference :441-442)
5. noise gating at ``dynamic_threshold × std``, where the std is taken over
   each *chunk* of cells (reference :448-453 computes it per process chunk —
   expressed here as a segmented reduction over ``chunk_ids``, which makes the
   result independent of how cells are batched onto devices)

The optional per-gene back-projection (reference :247-291, a pure-Python dict
loop) becomes a prefix-sum + two gathers: each gene's value is the mean of the
contiguous range of windows covering it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..genome.plan import WindowPlan

__all__ = ["build_infercnv_fn", "smooth_only_fn"]


def _center(x, ref):
    """Step 1: reference centering (bounded logFC for multi-category refs)."""
    if ref.shape[0] == 1:
        return x - ref[0][None, :]
    ref_min = jnp.min(ref, axis=0)[None, :]
    ref_max = jnp.max(ref, axis=0)[None, :]
    return jnp.where(x > ref_max, x - ref_max, jnp.where(x < ref_min, x - ref_min, jnp.zeros_like(x)))


def _boxcar_valid(x, width: int):
    """Valid-mode boxcar-sum along the last axis via one cumsum + slice diff."""
    c = jnp.cumsum(x, axis=-1)
    return jnp.concatenate([c[..., width - 1 : width], c[..., width:] - c[..., :-width]], axis=-1)


def _pyramid_conv(packed, plan: WindowPlan):
    """Stride-1 valid pyramid conv over the packed axis.

    Key identity: the pyramidal weights ``min(r, n+1-r)`` are the full
    convolution of two boxcars, ``ones(a) * ones(b)`` with ``a=(n+1)//2``,
    ``b=n+1-a``.  Two cumsum+difference passes therefore replace the O(n)
    sliding dot product — O(1) work per gene, HBM-bandwidth-bound on TPU
    (reference does the O(n) version with np.convolve, tl/_infercnv.py:208).
    """
    n = plan.window_size
    a = (n + 1) // 2
    b = n + 1 - a
    y = _boxcar_valid(_boxcar_valid(packed, a), b)
    return y / jnp.asarray(float(plan.pyramid_sum), dtype=packed.dtype)


def _smooth(xc, plan: WindowPlan, dtype, mode: str = "fast"):
    """Step 3: packed strided pyramid conv + small-chromosome uniform means.

    mode="fast": cumsum/boxcar factorization (default).
    mode="conv": direct strided XLA convolution (cross-check path).
    """
    parts = []
    if plan.n_reg_windows:
        packed_src = jnp.asarray(plan.packed_src)
        packed = jnp.take(xc, packed_src, axis=1, mode="fill", fill_value=0)
        if mode == "conv":
            kernel = jnp.asarray(plan.pyramid, dtype=dtype)
            y = jax.lax.conv_general_dilated(
                packed[:, None, :],
                kernel[None, None, :],
                window_strides=(plan.step,),
                padding="VALID",
                dimension_numbers=("NCH", "OIH", "NCH"),
            )[:, 0, :]
            parts.append(y[:, jnp.asarray(plan.conv_gather)])
        else:
            y = _pyramid_conv(packed, plan)
            parts.append(y[:, jnp.asarray(plan.conv_gather * plan.step)])
    if plan.n_small:
        xs = xc[:, jnp.asarray(plan.small_src)]
        seg_sum = jax.ops.segment_sum(xs.T, jnp.asarray(plan.small_seg), num_segments=plan.n_small)
        counts = jnp.asarray(plan.small_counts, dtype=dtype)
        parts.append((seg_sum / counts[:, None]).T)
    concat = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    return concat[:, jnp.asarray(plan.final_src)]


def _gene_values(smoothed, plan: WindowPlan, dtype):
    """Back-projection: gene value = mean of the covering (contiguous) windows."""
    lo = jnp.asarray(plan.gene_win_lo)
    hi = jnp.asarray(plan.gene_win_hi)
    prefix = jnp.concatenate(
        [jnp.zeros((smoothed.shape[0], 1), dtype=smoothed.dtype), jnp.cumsum(smoothed, axis=1)], axis=1
    )
    counts = (hi - lo + 1).astype(dtype)
    vals = (prefix[:, hi + 1] - prefix[:, jnp.maximum(lo, 0)]) / counts[None, :]
    return jnp.where(lo[None, :] >= 0, vals, jnp.nan)


def build_infercnv_fn(
    plan: WindowPlan,
    *,
    n_ref_rows: int,
    lfc_clip: float,
    dynamic_threshold: float | None,
    num_chunks: int,
    calculate_gene_values: bool = False,
    dtype=jnp.float32,
    smooth_mode: str = "fast",
):
    """Build the jitted end-to-end transform.

    Returns ``fn(x, ref, chunk_ids) -> (x_res, gene_res)``:

    * ``x``          — (cells, masked_genes) dense expression
    * ``ref``        — (n_ref_rows, masked_genes) reference baseline(s)
    * ``chunk_ids``  — (cells,) int32; cells with the same id share a noise-
      gate std (reference chunk semantics).  Ids must lie in ``[0, num_chunks]``
      — id == num_chunks marks padding rows, which receive a threshold from an
      unused segment and must be discarded by the caller.
    * ``gene_res``   — (cells, n_used_genes) or None; NaN for uncovered genes.
    """
    covered_idx = np.flatnonzero(plan.gene_win_lo >= 0)

    @jax.jit
    def fn(x, ref, chunk_ids):
        x = x.astype(dtype)
        ref = ref.astype(dtype)
        xc = _center(x, ref)
        xc = jnp.clip(xc, -lfc_clip, lfc_clip)
        smoothed = _smooth(xc, plan, dtype, smooth_mode)
        med = jnp.median(smoothed, axis=1)
        x_res = smoothed - med[:, None]

        gene_res = None
        if calculate_gene_values:
            gvals = _gene_values(smoothed, plan, dtype)
            gmed = jnp.median(gvals[:, jnp.asarray(covered_idx)], axis=1)
            gene_res = gvals - gmed[:, None]

        if dynamic_threshold is not None:
            n_win = x_res.shape[1]
            seg_sum = jax.ops.segment_sum(jnp.sum(x_res, axis=1), chunk_ids, num_segments=num_chunks + 1)
            seg_sq = jax.ops.segment_sum(jnp.sum(x_res * x_res, axis=1), chunk_ids, num_segments=num_chunks + 1)
            seg_n = jax.ops.segment_sum(jnp.full(x_res.shape[0], n_win, dtype=dtype), chunk_ids, num_segments=num_chunks + 1)
            seg_n = jnp.maximum(seg_n, 1)
            mean = seg_sum / seg_n
            var = jnp.maximum(seg_sq / seg_n - mean * mean, 0)
            thr = dynamic_threshold * jnp.sqrt(var)
            row_thr = thr[chunk_ids][:, None]
            x_res = jnp.where(jnp.abs(x_res) < row_thr, jnp.zeros_like(x_res), x_res)
            if gene_res is not None:
                gene_res = jnp.where(jnp.abs(gene_res) < row_thr, jnp.zeros_like(gene_res), gene_res)

        return x_res, gene_res

    return fn


def smooth_only_fn(plan: WindowPlan, dtype=jnp.float32, mode: str = "fast"):
    """Jitted smoothing-only transform (for benchmarking the hot conv)."""

    @jax.jit
    def fn(xc):
        return _smooth(xc.astype(dtype), plan, dtype, mode)

    return fn
