"""UMAP-style fuzzy kNN connectivity graph (vectorized JAX).

Replaces scanpy's ``sc.pp.neighbors`` graph construction (reference:
pp/__init__.py:43), which uses umap-learn's ``smooth_knn_dist`` /
``fuzzy_simplicial_set``.  The per-point sigma binary search runs as a fixed
64-iteration vectorized loop on device — no numba, no data-dependent control
flow.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

__all__ = ["fuzzy_connectivities", "knn_distance_matrix"]

_SMOOTH_K_TOLERANCE = 1e-5
_MIN_K_DIST_SCALE = 1e-3


@partial(jax.jit, static_argnames=("n_iter",))
def _smooth_knn_dist(dists, local_connectivity, n_iter=64):
    """Per-row (rho, sigma): UMAP smooth_knn_dist semantics.

    dists: (n, k) sorted ascending, first column = self (0).
    """
    n, k = dists.shape
    target = jnp.log2(jnp.asarray(float(k)))

    nonzero = dists > 0.0
    n_nonzero = jnp.sum(nonzero, axis=1)
    # rho = interpolated local_connectivity-th smallest nonzero distance
    big = jnp.where(nonzero, dists, jnp.inf)
    sorted_nz = jnp.sort(big, axis=1)
    li = jnp.floor(local_connectivity).astype(jnp.int32)
    interp = local_connectivity - li
    idx0 = jnp.clip(li - 1, 0, k - 1)
    idx1 = jnp.clip(li, 0, k - 1)
    base = jnp.take_along_axis(sorted_nz, jnp.full((n, 1), idx0), axis=1)[:, 0]
    nxt = jnp.take_along_axis(sorted_nz, jnp.full((n, 1), idx1), axis=1)[:, 0]
    rho = jnp.where(
        n_nonzero >= li,
        jnp.where(interp > _SMOOTH_K_TOLERANCE, base + interp * (nxt - base), base),
        jnp.where(n_nonzero > 0, jnp.max(jnp.where(nonzero, dists, -jnp.inf), axis=1), 0.0),
    )
    rho = jnp.where(jnp.isfinite(rho), rho, 0.0)

    def body(_, state):
        lo, hi, mid = state
        d = jnp.maximum(dists - rho[:, None], 0.0)
        psum = jnp.sum(jnp.exp(-d / mid[:, None]), axis=1)
        too_big = psum > target
        new_hi = jnp.where(too_big, mid, hi)
        new_lo = jnp.where(too_big, lo, mid)
        new_mid = jnp.where(too_big, (lo + mid) / 2.0, jnp.where(jnp.isinf(hi), mid * 2.0, (mid + hi) / 2.0))
        return new_lo, new_hi, new_mid

    lo = jnp.zeros(n)
    hi = jnp.full(n, jnp.inf)
    mid = jnp.ones(n)
    lo, hi, mid = jax.lax.fori_loop(0, n_iter, body, (lo, hi, mid))
    sigma = mid

    mean_d = jnp.mean(dists)
    mean_row = jnp.mean(dists, axis=1)
    sigma = jnp.where(
        rho > 0.0,
        jnp.maximum(sigma, _MIN_K_DIST_SCALE * mean_row),
        jnp.maximum(sigma, _MIN_K_DIST_SCALE * mean_d),
    )
    return rho, sigma


@jax.jit
def _membership(dists, rho, sigma):
    w = jnp.exp(-jnp.maximum(dists - rho[:, None], 0.0) / sigma[:, None])
    # self column (distance 0 at position 0) gets weight 0, like umap-learn
    return w.at[:, 0].set(0.0)


def fuzzy_connectivities(
    knn_dists: np.ndarray,
    knn_indices: np.ndarray,
    *,
    local_connectivity: float = 1.0,
    set_op_mix_ratio: float = 1.0,
) -> sp.csr_matrix:
    """Symmetrized fuzzy-union connectivity matrix (umap fuzzy_simplicial_set)."""
    n, k = knn_dists.shape
    rho, sigma = _smooth_knn_dist(jnp.asarray(knn_dists, jnp.float32), float(local_connectivity))
    w = np.asarray(_membership(jnp.asarray(knn_dists, jnp.float32), rho, sigma))

    rows = np.repeat(np.arange(n, dtype=np.int64), k)
    cols = knn_indices.astype(np.int64).ravel()
    vals = w.astype(np.float64).ravel()
    keep = cols >= 0
    A = sp.coo_matrix((vals[keep], (rows[keep], cols[keep])), shape=(n, n)).tocsr()
    A.sum_duplicates()

    T = A.T.tocsr()
    prod = A.multiply(T)
    conn = set_op_mix_ratio * (A + T - prod) + (1.0 - set_op_mix_ratio) * prod
    conn = conn.tocsr()
    conn.eliminate_zeros()
    return conn.astype(np.float32)


def knn_distance_matrix(knn_dists: np.ndarray, knn_indices: np.ndarray) -> sp.csr_matrix:
    """Sparse kNN distance matrix, self excluded (scanpy's `*_distances`)."""
    n, k = knn_dists.shape
    rows = np.repeat(np.arange(n, dtype=np.int64), k - 1)
    cols = knn_indices[:, 1:].astype(np.int64).ravel()
    vals = knn_dists[:, 1:].astype(np.float64).ravel()
    keep = cols >= 0
    D = sp.csr_matrix((vals[keep], (rows[keep], cols[keep])), shape=(n, n))
    return D.astype(np.float32)
