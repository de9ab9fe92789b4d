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

__all__ = [
    "native_leiden", "native_available", "native_pack_csr", "native_pack_dense",
    "native_pack_available", "native_coo_remap", "native_dense_to_csr",
]

_SRC_DIR = Path(__file__).parent
_LIB = None
_LIB_TRIED = False
_PACK_LIB = None
_PACK_TRIED = False


def _build_library(stem: str, extra_flags: tuple[str, ...] = ()) -> Path | None:
    src = _SRC_DIR / f"{stem}.cpp"
    tag = hashlib.sha256(src.read_bytes()).hexdigest()[:12]
    out = _SRC_DIR / f"lib{stem}-{tag}.so"
    if out.exists():
        return out
    # build in a temp file then atomically rename (concurrent-safe)
    with tempfile.NamedTemporaryFile(suffix=".so", dir=_SRC_DIR, delete=False) as tmp:
        tmp_path = Path(tmp.name)
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", *extra_flags, str(src), "-o", str(tmp_path)],
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
    path = _build_library("leiden")
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


# ---------------------------------------------------------------------------
# Parallel CSR/dense -> packed-dense densifier (pack.cpp)
# ---------------------------------------------------------------------------

_I64P = ctypes.POINTER(ctypes.c_int64)
_I32P = ctypes.POINTER(ctypes.c_int32)
_F32P = ctypes.POINTER(ctypes.c_float)
_F64P = ctypes.POINTER(ctypes.c_double)


def _load_pack():
    global _PACK_LIB, _PACK_TRIED
    if _PACK_TRIED:
        return _PACK_LIB
    _PACK_TRIED = True
    path = _build_library("pack", ("-fopenmp",)) or _build_library("pack")
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(str(path))
        lib.pack_csr_f32.restype = ctypes.c_int64
        lib.pack_csr_f32.argtypes = [_I64P, _I32P, _F32P, ctypes.c_int64, _I64P, ctypes.c_int64, _F32P]
        lib.pack_csr_f64.restype = ctypes.c_int64
        lib.pack_csr_f64.argtypes = [_I64P, _I32P, _F64P, ctypes.c_int64, _I64P, ctypes.c_int64, _F64P]
        lib.pack_dense_f32.restype = None
        lib.pack_dense_f32.argtypes = [_F32P, ctypes.c_int64, ctypes.c_int64, _I64P, ctypes.c_int64, _F32P]
        lib.pack_dense_f64.restype = None
        lib.pack_dense_f64.argtypes = [_F64P, ctypes.c_int64, ctypes.c_int64, _I64P, ctypes.c_int64, _F64P]
        lib.coo_remap_f32.restype = ctypes.c_int64
        lib.coo_remap_f32.argtypes = [
            _I64P, _I32P, _F32P, ctypes.c_int64, _I64P, ctypes.c_int64, _I64P,
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p, ctypes.c_int32, _I32P,
        ]
        lib.dense_nnz_rows_f32.restype = None
        lib.dense_nnz_rows_f32.argtypes = [_F32P, ctypes.c_int64, ctypes.c_int64, _I64P]
        lib.dense_fill_csr_f32.restype = None
        lib.dense_fill_csr_f32.argtypes = [_F32P, ctypes.c_int64, ctypes.c_int64, _I64P, _I32P, _F32P]
        _PACK_LIB = lib
    except OSError:
        _PACK_LIB = None
    return _PACK_LIB


def native_pack_available() -> bool:
    return _load_pack() is not None


def native_pack_csr(indptr, indices, data, lut, out_width: int, dtype) -> np.ndarray | None:
    """Densify CSR straight into the packed layout; None if lib unavailable.

    ``out`` columns not named by ``lut`` stay zero (calloc pages — only the
    nnz fraction of the output is ever touched on the host).
    """
    lib = _load_pack()
    if lib is None:
        return None
    dtype = np.dtype(dtype)
    if dtype not in (np.float32, np.float64):
        return None
    n_rows = len(indptr) - 1
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    data = np.ascontiguousarray(data, dtype=dtype)
    lut = np.ascontiguousarray(lut, dtype=np.int64)
    # the C scatter is unchecked — enforce the bounds the numpy fallback
    # would enforce via IndexError, instead of corrupting the heap
    if len(indices) and int(indices.max()) >= len(lut):
        raise IndexError(f"pack_csr: column index {int(indices.max())} out of range for lut of length {len(lut)}")
    if lut.max(initial=-1) >= out_width:
        raise IndexError(f"pack_csr: lut maps to column {int(lut.max())} >= out_width {out_width}")
    out = np.zeros((n_rows, out_width), dtype=dtype)
    fn = lib.pack_csr_f32 if dtype == np.float32 else lib.pack_csr_f64
    fp = _F32P if dtype == np.float32 else _F64P
    fn(
        indptr.ctypes.data_as(_I64P),
        indices.ctypes.data_as(_I32P),
        data.ctypes.data_as(fp),
        ctypes.c_int64(n_rows),
        lut.ctypes.data_as(_I64P),
        ctypes.c_int64(out_width),
        out.ctypes.data_as(fp),
    )
    return out


def native_coo_remap(indptr, indices, data, lut, cap: int, col_dtype, val_dtype):
    """CSR batch -> compact remapped (cols, vals, counts, nnz); None if no lib.

    ``cols``/``vals`` come back as length-``cap`` arrays with entries
    ``[0, nnz)`` filled; the caller pads the tail (pad col / zero val).
    ``val_dtype`` float32 or bfloat16 (conversion fused into the write pass).
    """
    lib = _load_pack()
    if lib is None:
        return None
    col_dtype = np.dtype(col_dtype)
    val_dtype = np.dtype(val_dtype)
    # the driver's col_index_dtype() yields uint16 for widths <= 65536; the
    # C int16 store writes the same 16 bits, so reinterpreting the buffer as
    # uint16 is exact for any column id < 2^16
    if col_dtype not in (np.int16, np.uint16, np.int32):
        return None
    if val_dtype == np.float32:
        vals_mode = 0
    elif val_dtype.name == "bfloat16":
        vals_mode = 1
    else:
        return None
    if np.dtype(data.dtype) != np.float32:
        return None
    n_rows = len(indptr) - 1
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    data = np.ascontiguousarray(data, dtype=np.float32)
    lut = np.ascontiguousarray(lut, dtype=np.int64)
    if len(indices) and int(indices.max()) >= len(lut):
        raise IndexError(f"coo_remap: column index {int(indices.max())} out of range for lut of length {len(lut)}")
    cols = np.empty(cap, dtype=col_dtype)
    vals = np.empty(cap, dtype=np.uint16 if vals_mode == 1 else np.float32)
    counts = np.empty(n_rows, dtype=np.int32)
    offsets = np.empty(n_rows + 1, dtype=np.int64)
    nnz = lib.coo_remap_f32(
        indptr.ctypes.data_as(_I64P),
        indices.ctypes.data_as(_I32P),
        data.ctypes.data_as(_F32P),
        ctypes.c_int64(n_rows),
        lut.ctypes.data_as(_I64P),
        ctypes.c_int64(cap),
        offsets.ctypes.data_as(_I64P),
        cols.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int32(1 if col_dtype.itemsize == 2 else 0),
        vals.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int32(vals_mode),
        counts.ctypes.data_as(_I32P),
    )
    if nnz < 0:
        raise ValueError(f"nnz_cap {cap} too small for batch with {-nnz} kept nonzeros")
    if vals_mode == 1:
        vals = vals.view(val_dtype)
    return cols, vals, counts, int(nnz)


def native_dense_to_csr(arr) -> tuple | None:
    """Dense f32 (rows x cols) -> (data, indices, indptr); None if no lib."""
    lib = _load_pack()
    if lib is None:
        return None
    arr = np.ascontiguousarray(arr)
    if arr.dtype != np.float32 or arr.ndim != 2:
        return None
    n_rows, n_cols = arr.shape
    row_nnz = np.empty(n_rows, dtype=np.int64)
    lib.dense_nnz_rows_f32(
        arr.ctypes.data_as(_F32P), ctypes.c_int64(n_rows), ctypes.c_int64(n_cols),
        row_nnz.ctypes.data_as(_I64P),
    )
    indptr = np.empty(n_rows + 1, dtype=np.int64)
    indptr[0] = 0
    np.cumsum(row_nnz, out=indptr[1:])
    nnz = int(indptr[-1])
    indices = np.empty(nnz, dtype=np.int32)
    data = np.empty(nnz, dtype=np.float32)
    lib.dense_fill_csr_f32(
        arr.ctypes.data_as(_F32P), ctypes.c_int64(n_rows), ctypes.c_int64(n_cols),
        indptr.ctypes.data_as(_I64P), indices.ctypes.data_as(_I32P),
        data.ctypes.data_as(_F32P),
    )
    # scipy requires indptr and indices to share ONE index dtype (mixed
    # dtypes make its C routines misread memory); int32 covers any batch
    if nnz < 2**31 - 1:
        indptr = indptr.astype(np.int32)
    else:  # pragma: no cover - >2^31 nnz in one block
        indices = indices.astype(np.int64)
    return data, indices, indptr


def native_pack_dense(src, lut, out_width: int, dtype) -> np.ndarray | None:
    """Column-remap a dense block into the packed layout; None if unavailable."""
    lib = _load_pack()
    if lib is None:
        return None
    dtype = np.dtype(dtype)
    if dtype not in (np.float32, np.float64):
        return None
    src = np.ascontiguousarray(src, dtype=dtype)
    lut = np.ascontiguousarray(lut, dtype=np.int64)
    n_rows, n_cols = src.shape
    if len(lut) < n_cols:
        raise IndexError(f"pack_dense: lut of length {len(lut)} shorter than {n_cols} input columns")
    if lut.max(initial=-1) >= out_width:
        raise IndexError(f"pack_dense: lut maps to column {int(lut.max())} >= out_width {out_width}")
    out = np.zeros((n_rows, out_width), dtype=dtype)
    fn = lib.pack_dense_f32 if dtype == np.float32 else lib.pack_dense_f64
    fp = _F32P if dtype == np.float32 else _F64P
    fn(
        src.ctypes.data_as(fp),
        ctypes.c_int64(n_rows),
        ctypes.c_int64(n_cols),
        lut.ctypes.data_as(_I64P),
        ctypes.c_int64(out_width),
        out.ctypes.data_as(fp),
    )
    return out
