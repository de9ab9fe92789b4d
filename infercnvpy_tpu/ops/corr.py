"""Pairwise Pearson correlation on device (one standardize + one MXU matmul).

Used by tl.ithcna / tl.ithgex (reference computes np.corrcoef host-side,
tl/_scores.py:137,207); here rows are standardized and correlations become a
single (cells × cells) matmul, which XLA tiles onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["pearson_rows"]


@jax.jit
def _pearson_rows(X):
    X = X - jnp.mean(X, axis=1, keepdims=True)
    norm = jnp.sqrt(jnp.sum(X * X, axis=1, keepdims=True))
    Xn = X / norm
    return jnp.clip(Xn @ Xn.T, -1.0, 1.0)


def pearson_rows(X):
    """Correlation matrix of the rows of X (np.corrcoef semantics, float32 device math)."""
    return _pearson_rows(jnp.asarray(X, dtype=jnp.float32))
