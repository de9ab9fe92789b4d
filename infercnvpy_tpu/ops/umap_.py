"""UMAP layout optimization in JAX (standalone replacement for umap-learn).

The reference delegates to ``sc.tl.umap`` (reference: tl/__init__.py:103),
which wraps umap-learn's numba SGD.  Here the embedding is optimized with the
same objective (attractive/repulsive cross-entropy on the fuzzy graph, the
standard (a, b) low-dimensional similarity curve) but as a *vectorized* epoch
loop on device: every edge applies its attraction with probability
proportional to its membership weight; negative samples are drawn uniformly —
a batched formulation of umap-learn's per-sample SGD schedule.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

__all__ = ["umap_layout", "find_ab_params", "spectral_init"]


def find_ab_params(spread: float = 1.0, min_dist: float = 0.5):
    """Fit the (a, b) similarity-curve parameters (umap-learn's procedure)."""
    from scipy.optimize import curve_fit

    def curve(x, a, b):
        return 1.0 / (1.0 + a * x ** (2 * b))

    xv = np.linspace(0, spread * 3, 300)
    yv = np.zeros_like(xv)
    yv[xv < min_dist] = 1.0
    mask = xv >= min_dist
    yv[mask] = np.exp(-(xv[mask] - min_dist) / spread)
    params, _ = curve_fit(curve, xv, yv)
    return float(params[0]), float(params[1])


def spectral_init(graph: sp.spmatrix, n_components: int = 2, seed: int = 0) -> np.ndarray:
    """Spectral layout from the normalized graph Laplacian (umap's default init)."""
    n = graph.shape[0]
    rng = np.random.default_rng(seed)
    try:
        from scipy.sparse.linalg import eigsh

        A = sp.csr_matrix(graph)
        deg = np.asarray(A.sum(axis=1)).ravel()
        deg[deg == 0] = 1.0
        Dinv = sp.diags(1.0 / np.sqrt(deg))
        L = sp.identity(n) - Dinv @ A @ Dinv
        k = n_components + 1
        vals, vecs = eigsh(L, k=k, which="SM", tol=1e-4, maxiter=n * 5)
        order = np.argsort(vals)
        emb = vecs[:, order[1 : k]]
        expansion = 10.0 / max(np.abs(emb).max(), 1e-12)
        return (emb * expansion).astype(np.float32) + rng.normal(scale=1e-4, size=(n, n_components)).astype(np.float32)
    except Exception:
        return rng.uniform(-10, 10, size=(n, n_components)).astype(np.float32)


@partial(jax.jit, static_argnames=("n_epochs", "negative_sample_rate"))
def _optimize(emb, heads, tails, probs, a, b, key, n_epochs, negative_sample_rate, initial_alpha):
    n = emb.shape[0]

    def epoch(e, state):
        emb, key = state
        key, k1, k2 = jax.random.split(key, 3)
        alpha = initial_alpha * (1.0 - e / n_epochs)

        active = jax.random.uniform(k1, probs.shape) < probs
        h = emb[heads]
        t = emb[tails]
        diff = h - t
        d2 = jnp.sum(diff * diff, axis=1)
        # attractive gradient coefficient (umap-learn optimize_layout)
        ac = (-2.0 * a * b * d2 ** (b - 1.0)) / (a * d2**b + 1.0)
        ac = jnp.where(d2 > 0, ac, 0.0)
        grad = jnp.clip(ac[:, None] * diff, -4.0, 4.0) * active[:, None]
        emb = emb.at[heads].add(alpha * grad)
        emb = emb.at[tails].add(-alpha * grad)

        # negative samples: repulsion on the head endpoint only
        neg = jax.random.randint(k2, (heads.shape[0], negative_sample_rate), 0, n)
        hh = emb[heads][:, None, :]
        tt = emb[neg]
        diffn = hh - tt
        d2n = jnp.sum(diffn * diffn, axis=2)
        rc = (2.0 * b) / ((0.001 + d2n) * (a * d2n**b + 1.0))
        gradn = jnp.clip(rc[:, :, None] * diffn, -4.0, 4.0)
        gradn = gradn * active[:, None, None]
        emb = emb.at[heads].add(alpha * jnp.sum(gradn, axis=1))
        return emb, key

    emb, _ = jax.lax.fori_loop(0, n_epochs, epoch, (emb, key))
    return emb


def umap_layout(
    graph: sp.spmatrix,
    *,
    n_components: int = 2,
    min_dist: float = 0.5,
    spread: float = 1.0,
    n_epochs: int | None = None,
    initial_alpha: float = 1.0,
    negative_sample_rate: int = 5,
    init: np.ndarray | None = None,
    seed: int = 0,
) -> np.ndarray:
    """Optimize a UMAP embedding of a fuzzy connectivity graph."""
    graph = sp.coo_matrix(graph)
    n = graph.shape[0]
    if n_epochs is None:
        n_epochs = 500 if n <= 10000 else 200

    w = graph.data.astype(np.float32)
    keep = w >= w.max() / float(n_epochs)
    heads = graph.row[keep].astype(np.int32)
    tails = graph.col[keep].astype(np.int32)
    probs = (w[keep] / w.max()).astype(np.float32)

    a, b = find_ab_params(spread, min_dist)
    emb0 = spectral_init(graph, n_components, seed) if init is None else np.asarray(init, np.float32)

    emb = _optimize(
        jnp.asarray(emb0),
        jnp.asarray(heads),
        jnp.asarray(tails),
        jnp.asarray(probs),
        a,
        b,
        jax.random.PRNGKey(seed),
        int(n_epochs),
        int(negative_sample_rate),
        float(initial_alpha),
    )
    return np.asarray(emb, dtype=np.float32)
