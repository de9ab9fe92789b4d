"""Small shared utilities (matrix-representation selection, logging).

Behavioral contract follows reference: src/infercnvpy/_util.py:4-24.
"""

from __future__ import annotations

import sys

import numpy as np

from . import settings

__all__ = ["_ensure_array", "_choose_mtx_rep", "warn", "info"]


def _ensure_array(a):
    """If ``a`` is a np.matrix, turn it into a plain ndarray (reference: _util.py:4-9)."""
    return np.asarray(a) if isinstance(a, np.matrix) else a


def _choose_mtx_rep(adata, use_raw: bool = False, layer: str | None = None):
    """Select the expression matrix: a named layer, ``raw.X``, or ``X``
    (same precedence and conflict rule as reference: _util.py:12-24)."""
    if use_raw and layer is not None:
        raise ValueError(f"use_raw=True conflicts with layer={layer!r}: pick one expression source")
    if layer is not None:
        return adata.layers[layer]
    return adata.raw.X if use_raw else adata.X


def warn(msg: str):
    if settings.verbosity >= 1:
        print(f"WARNING: {msg}", file=sys.stderr)


def info(msg: str):
    if settings.verbosity >= 2:
        print(msg, file=sys.stderr)
