"""t-SNE in JAX (standalone replacement for sklearn's t-SNE used by scanpy).

The reference delegates to ``sc.tl.tsne`` (reference: tl/__init__.py:139).
TPU formulation: sparse high-dimensional affinities from the exact kNN graph
(3·perplexity neighbors, like Barnes-Hut t-SNE), vectorized per-point beta
binary search, then full gradient descent where the O(N²) repulsive term is
computed from the 2-D embedding only — one small matmul-shaped pass per
iteration, no trees.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from .knn import exact_knn

__all__ = ["tsne_embed"]


@jax.jit
def _binary_search_beta(d2, target_entropy):
    """Per-row beta (precision) s.t. the conditional distribution's perplexity matches."""

    def body(_, state):
        beta, lo, hi = state
        p = jnp.exp(-d2 * beta[:, None])
        sum_p = jnp.maximum(jnp.sum(p, axis=1), 1e-12)
        H = jnp.log(sum_p) + beta * jnp.sum(d2 * p, axis=1) / sum_p
        too_high = H > target_entropy  # entropy too high -> increase beta
        new_lo = jnp.where(too_high, beta, lo)
        new_hi = jnp.where(too_high, hi, beta)
        new_beta = jnp.where(
            too_high,
            jnp.where(jnp.isinf(hi), beta * 2.0, (beta + hi) / 2.0),
            jnp.where(lo <= 0, beta / 2.0, (beta + new_lo) / 2.0),
        )
        return new_beta, new_lo, new_hi

    n = d2.shape[0]
    beta, _, _ = jax.lax.fori_loop(
        0, 64, body, (jnp.ones(n), jnp.zeros(n), jnp.full(n, jnp.inf))
    )
    p = jnp.exp(-d2 * beta[:, None])
    return p / jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-12)


@partial(jax.jit, static_argnames=("n_iter", "exag_iter"))
def _optimize(Y0, P_rows, P_cols, P_vals, n_iter, exag_iter, early_exaggeration, learning_rate):
    n = Y0.shape[0]

    def grad_fn(Y, exag):
        diff_q = Y[:, None, :] - Y[None, :, :]  # (n, n, 2): fine, d=2
        d2 = jnp.sum(diff_q * diff_q, axis=2)
        q_num = 1.0 / (1.0 + d2)
        q_num = q_num.at[jnp.arange(n), jnp.arange(n)].set(0.0)
        Z = jnp.maximum(jnp.sum(q_num), 1e-12)
        # attractive: sparse over kNN edges
        pd = Y[P_rows] - Y[P_cols]
        pq = 1.0 / (1.0 + jnp.sum(pd * pd, axis=1))
        att = jnp.zeros_like(Y).at[P_rows].add((exag * P_vals * pq)[:, None] * pd)
        # repulsive: dense over the 2-D embedding
        rep_w = q_num * q_num / Z
        rep = jnp.sum(rep_w[:, :, None] * diff_q, axis=1)
        return 4.0 * (att - rep)

    def step(i, state):
        Y, vel, gains = state
        exag = jnp.where(i < exag_iter, early_exaggeration, 1.0)
        momentum = jnp.where(i < exag_iter, 0.5, 0.8)
        g = grad_fn(Y, exag)
        same_sign = jnp.sign(g) == jnp.sign(vel)
        gains = jnp.clip(jnp.where(same_sign, gains * 0.8, gains + 0.2), 0.01, None)
        vel = momentum * vel - learning_rate * gains * g
        Y = Y + vel
        Y = Y - jnp.mean(Y, axis=0, keepdims=True)
        return Y, vel, gains

    Y, _, _ = jax.lax.fori_loop(
        0, n_iter, step, (Y0, jnp.zeros_like(Y0), jnp.ones_like(Y0))
    )
    return Y


def tsne_embed(
    X: np.ndarray,
    *,
    perplexity: float = 30.0,
    n_components: int = 2,
    n_iter: int = 1000,
    early_exaggeration: float = 12.0,
    learning_rate: float = 200.0,
    seed: int = 0,
) -> np.ndarray:
    """Embed X (cells × features, usually the CNV PCA) into 2-D with t-SNE."""
    X = np.asarray(X, dtype=np.float32)
    n = X.shape[0]
    perplexity = min(perplexity, max(1.0, (n - 1) / 3.0))
    k = int(min(n - 1, max(3, 3 * perplexity)))

    dists, idxs = exact_knn(X, k + 1)
    d2 = jnp.asarray(dists[:, 1:] ** 2)
    P_cond = np.asarray(_binary_search_beta(d2, jnp.log(jnp.asarray(perplexity))))

    rows = np.repeat(np.arange(n), k)
    cols = idxs[:, 1:].ravel()
    P = sp.coo_matrix((P_cond.ravel(), (rows, cols)), shape=(n, n)).tocsr()
    P = (P + P.T) / (2.0 * n)
    P = P.tocoo()

    rng = np.random.default_rng(seed)
    Y0 = (rng.standard_normal((n, n_components)) * 1e-4).astype(np.float32)

    Y = _optimize(
        jnp.asarray(Y0),
        jnp.asarray(P.row.astype(np.int32)),
        jnp.asarray(P.col.astype(np.int32)),
        jnp.asarray(P.data.astype(np.float32)),
        int(n_iter),
        250,
        float(early_exaggeration),
        float(learning_rate),
    )
    return np.asarray(Y, dtype=np.float32)
