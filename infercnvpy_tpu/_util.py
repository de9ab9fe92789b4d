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
    if isinstance(a, np.matrix):
        return a.A
    return a


def _choose_mtx_rep(adata, use_raw: bool = False, layer: str | None = None):
    """Select X / raw.X / a layer (reference: _util.py:12-24)."""
    is_layer = layer is not None
    if use_raw and is_layer:
        raise ValueError(
            f"Cannot use expression from both layer and raw. You provided:'use_raw={use_raw}' and 'layer={layer}'"
        )
    if is_layer:
        return adata.layers[layer]
    elif use_raw:
        return adata.raw.X
    else:
        return adata.X


def warn(msg: str):
    if settings.verbosity >= 1:
        print(f"WARNING: {msg}", file=sys.stderr)


def info(msg: str):
    if settings.verbosity >= 2:
        print(msg, file=sys.stderr)
