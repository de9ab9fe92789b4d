"""Native (C++) runtime components, loaded via ctypes.

The reference's heavy clustering lives in third-party C++ (leidenalg/igraph);
this package ships its own small native library, compiled on demand with the
system ``g++`` and cached next to the sources.  Everything has a pure-Python
fallback, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

__all__ = ["native_leiden", "native_available"]

_SRC_DIR = Path(__file__).parent
_LIB = None
_LIB_TRIED = False


def _build_library() -> Path | None:
    src = _SRC_DIR / "leiden.cpp"
    tag = hashlib.sha256(src.read_bytes()).hexdigest()[:12]
    out = _SRC_DIR / f"libleiden-{tag}.so"
    if out.exists():
        return out
    # build in a temp file then atomically rename (concurrent-safe)
    with tempfile.NamedTemporaryFile(suffix=".so", dir=_SRC_DIR, delete=False) as tmp:
        tmp_path = Path(tmp.name)
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", str(src), "-o", str(tmp_path)],
            check=True,
            capture_output=True,
            timeout=300,
        )
        os.replace(tmp_path, out)
        return out
    except Exception:
        tmp_path.unlink(missing_ok=True)
        return None


def _load():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = _build_library()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(str(path))
        lib.leiden_cluster.restype = ctypes.c_int64
        lib.leiden_cluster.argtypes = [
            ctypes.POINTER(ctypes.c_int64),  # indptr
            ctypes.POINTER(ctypes.c_int32),  # indices
            ctypes.POINTER(ctypes.c_double),  # weights
            ctypes.c_int64,  # n_nodes
            ctypes.c_double,  # resolution
            ctypes.c_uint64,  # seed
            ctypes.c_int64,  # max_rounds
            ctypes.POINTER(ctypes.c_int64),  # labels_out
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load() is not None


def native_leiden(indptr, indices, weights, resolution: float, seed: int, max_rounds: int) -> np.ndarray | None:
    """Run the C++ Leiden; returns labels or None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(indptr) - 1
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    weights = np.ascontiguousarray(weights, dtype=np.float64)
    labels = np.empty(n, dtype=np.int64)
    lib.leiden_cluster(
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        weights.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(n),
        ctypes.c_double(resolution),
        ctypes.c_uint64(seed),
        ctypes.c_int64(max_rounds),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return labels
