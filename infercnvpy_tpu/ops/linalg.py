"""Batched TPU linear algebra: truncated SVD / PCA of the cell×window matrix.

Replaces the reference's ARPACK path (reference: tl/__init__.py:66-71 calls
``sc.tl.pca(svd_solver="arpack", zero_center=False)``).  TPU-native design:
accumulate the (windows × windows) Gram matrix with blocked MXU matmuls over
streamed row blocks (works for sparse inputs of any cell count), then a single
dense ``eigh`` on the small Gram matrix gives the top components.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

__all__ = ["truncated_svd"]


@jax.jit
def _gram_accum(G, block):
    return G + block.T @ block


@jax.jit
def _col_sums(s, block):
    return s + jnp.sum(block, axis=0)


def _project(block, V):
    return np.asarray(jnp.asarray(block) @ V)


def truncated_svd(
    X,
    n_comps: int,
    *,
    zero_center: bool = False,
    block_rows: int = 16384,
    dtype=np.float32,
    sign_convention: bool = True,
):
    """Top-``n_comps`` principal scores of X (cells × features).

    Returns (scores, components, singular_values):
    ``scores[i] = X[i] @ components.T`` — matching sklearn TruncatedSVD /
    non-centered PCA semantics used by the reference.
    """
    n, d = X.shape
    n_comps = int(min(n_comps, min(n, d)))

    G = jnp.zeros((d, d), dtype=jnp.float32)
    s = jnp.zeros((d,), dtype=jnp.float32)
    for start in range(0, n, block_rows):
        blk = X[start : start + block_rows]
        blk = blk.toarray() if sp.issparse(blk) else np.asarray(blk)
        blk = jnp.asarray(blk.astype(dtype, copy=False))
        G = _gram_accum(G, blk)
        if zero_center:
            s = _col_sums(s, blk)

    if zero_center:
        mu = s / n
        G = G - n * jnp.outer(mu, mu)

    evals, evecs = jnp.linalg.eigh(G)  # ascending
    order = jnp.argsort(evals)[::-1][:n_comps]
    top_vals = jnp.maximum(evals[order], 0.0)
    V = evecs[:, order]  # (d, k)

    mu_np = np.asarray(s / n) if zero_center else None
    V_np = np.asarray(V)
    scores = np.empty((n, n_comps), dtype=np.float32)
    for start in range(0, n, block_rows):
        blk = X[start : start + block_rows]
        blk = blk.toarray() if sp.issparse(blk) else np.asarray(blk)
        blk = blk.astype(np.float32, copy=False)
        if zero_center:
            blk = blk - mu_np
        scores[start : start + blk.shape[0]] = _project(blk, V_np)

    if sign_convention:
        # deterministic signs: largest-|loading| entry of each component positive
        # (sklearn svd_flip-style; makes runs reproducible across backends)
        flip = np.sign(V_np[np.argmax(np.abs(V_np), axis=0), np.arange(n_comps)])
        flip[flip == 0] = 1.0
        scores *= flip
        V_np = V_np * flip

    return scores, V_np.T, np.sqrt(np.asarray(top_vals))
