"""Exact k-nearest-neighbors via tiled MXU matmuls + running top-k merge.

Replaces the reference's pynndescent/numba approximate kNN (reference:
pp/__init__.py:43 via scanpy).  On TPU, brute-force exact kNN is a natural
fit: squared distances are one matmul per (query block × database block) tile,
and a running top-k merge keeps memory at O(block² ) regardless of cell count.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["exact_knn"]


@partial(jax.jit, static_argnames=("k",))
def _query_block_knn(q, qn, qidx, db, dbn, dbidx, k):
    """Top-k nearest DB points for one query block, scanning DB blocks.

    q:   (Bq, d)      query block
    db:  (nb, Bd, d)  database blocks (padded)
    dbn: (nb, Bd)     database squared norms (+inf on padding)
    dbidx: (nb, Bd)   global indices of database points (-1 on padding)
    """

    def scan_body(carry, xs):
        best_d, best_i = carry
        blk, blkn, blki = xs
        d2 = qn[:, None] + blkn[None, :] - 2.0 * q @ blk.T
        # exact-zero self distance so the query point always ranks first
        d2 = jnp.where(blki[None, :] == qidx[:, None], -1.0, d2)
        cat_d = jnp.concatenate([best_d, d2], axis=1)
        cat_i = jnp.concatenate([best_i, jnp.broadcast_to(blki[None, :], d2.shape)], axis=1)
        neg_top, top_pos = jax.lax.top_k(-cat_d, k)
        return (-neg_top, jnp.take_along_axis(cat_i, top_pos, axis=1)), None

    init_d = jnp.full((q.shape[0], k), jnp.inf, dtype=q.dtype)
    init_i = jnp.full((q.shape[0], k), -1, dtype=jnp.int32)
    (best_d, best_i), _ = jax.lax.scan(scan_body, (init_d, init_i), (db, dbn, dbidx))
    return jnp.sqrt(jnp.maximum(best_d, 0.0)), best_i


def exact_knn(X: np.ndarray, k: int, *, block: int = 4096):
    """Exact Euclidean kNN (self included as the first neighbor).

    Returns ``(distances, indices)`` of shape (n, k); row i starts with i
    itself at distance 0 — the layout scanpy's neighbor stack expects.
    """
    X = np.ascontiguousarray(np.asarray(X, dtype=np.float32))
    n, d = X.shape
    k = int(min(k, n))

    n_db_blocks = -(-n // block)
    pad_n = n_db_blocks * block
    Xp = np.zeros((pad_n, d), dtype=np.float32)
    Xp[:n] = X
    norms = np.full(pad_n, np.inf, dtype=np.float32)
    norms[:n] = (X * X).sum(axis=1)
    gidx = np.full(pad_n, -1, dtype=np.int32)
    gidx[:n] = np.arange(n, dtype=np.int32)

    db = jnp.asarray(Xp.reshape(n_db_blocks, block, d))
    dbn = jnp.asarray(norms.reshape(n_db_blocks, block))
    dbidx = jnp.asarray(gidx.reshape(n_db_blocks, block))

    dists = np.empty((pad_n, k), dtype=np.float32)
    idxs = np.empty((pad_n, k), dtype=np.int32)
    for start in range(0, pad_n, block):
        qs = slice(start, start + block)
        dblk, iblk = _query_block_knn(
            jnp.asarray(Xp[qs]), jnp.asarray(norms[qs]), jnp.asarray(gidx[qs]), db, dbn, dbidx, k
        )
        dists[qs] = np.asarray(dblk)
        idxs[qs] = np.asarray(iblk)
    return dists[:n], idxs[:n]
