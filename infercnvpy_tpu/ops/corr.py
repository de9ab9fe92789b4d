"""Pairwise Pearson correlation on device (standardize + MXU matmuls).

Used by tl.ithcna / tl.ithgex (reference computes float64 np.corrcoef
host-side, tl/_scores.py:137,207); here rows are standardized and the
correlations become (cells × cells) matmuls, which XLA tiles onto the MXU.

Precision: with jax x64 enabled the whole computation runs in float64 and
matches ``np.corrcoef`` to ~1e-13.  Without x64 (TPU default), rows are
standardized in float64 on the host and split into double-float32 (hi, lo)
parts; the Gram matrix is then ``hi·hiᵀ + hi·loᵀ + lo·hiᵀ`` with HIGHEST
matmul precision — a compensated-f32 scheme whose residual error is the f32
accumulation of the dominant term (~1e-6 absolute on unit-norm rows) instead
of the ~1e-3 of a plain bf16-MXU matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pearson_rows"]


@jax.jit
def _pearson_rows_f64(X):
    X = X - jnp.mean(X, axis=1, keepdims=True)
    norm = jnp.sqrt(jnp.sum(X * X, axis=1, keepdims=True))
    Xn = X / norm
    return jnp.clip(Xn @ Xn.T, -1.0, 1.0)


@jax.jit
def _pearson_rows_split(hi, lo):
    P = jax.lax.Precision.HIGHEST
    g = jnp.dot(hi, hi.T, precision=P) + jnp.dot(hi, lo.T, precision=P) + jnp.dot(lo, hi.T, precision=P)
    return jnp.clip(g, -1.0, 1.0)


def pearson_rows(X):
    """Correlation matrix of the rows of X (np.corrcoef semantics)."""
    X = np.asarray(X, dtype=np.float64)
    if jax.config.read("jax_enable_x64"):
        return _pearson_rows_f64(jnp.asarray(X))
    # standardize in f64 host-side, then double-f32 split for the device Gram
    Xc = X - X.mean(axis=1, keepdims=True)
    Xn = Xc / np.sqrt(np.sum(Xc * Xc, axis=1, keepdims=True))
    hi = Xn.astype(np.float32)
    lo = (Xn - hi).astype(np.float32)
    return _pearson_rows_split(jnp.asarray(hi), jnp.asarray(lo))
