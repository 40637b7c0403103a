"""Native (C++) host-side runtime components.

Build-on-demand: the first import compiles ``assembly.cpp`` with the
system ``g++`` into a shared library cached next to this file and binds
it with ctypes. Everything here has a pure-numpy fallback — the native
path is an accelerator for large one-time assembly jobs, never a
correctness dependency (``tests/test_native.py`` pins native == numpy).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "assembly.cpp")
_LIB = os.path.join(_DIR, "_assembly.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB
    except Exception:
        return None


def load() -> Optional[ctypes.CDLL]:
    """The bound native library, building it if needed; None if no
    toolchain is available (callers must fall back to numpy)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _LIB if os.path.exists(_LIB) else _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            # Stale binary for a different ABI: rebuild once.
            if _build() is None:
                return None
            lib = ctypes.CDLL(_LIB)
        i64 = ctypes.c_int64
        p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        for suffix, t in (("f64", np.float64), ("f32", np.float32)):
            fn = getattr(lib, f"ell_from_coo_{suffix}")
            fn.restype = i64
            fn.argtypes = [
                i64, i64, p_i64, p_i64,
                np.ctypeslib.ndpointer(t, flags="C_CONTIGUOUS"), i64,
                ctypes.c_void_p, ctypes.c_void_p,
            ]
        try:
            fn = lib.rcm_order
            fn.restype = i64
            fn.argtypes = [i64, i64, p_i64, p_i64, p_i64]
        except AttributeError:
            # Stale pre-RCM binary: rebuild once and rebind.
            if _build() is not None:
                lib = ctypes.CDLL(_LIB)
                for suffix, t in (("f64", np.float64), ("f32", np.float32)):
                    fn2 = getattr(lib, f"ell_from_coo_{suffix}")
                    fn2.restype = i64
                    fn2.argtypes = [
                        i64, i64, p_i64, p_i64,
                        np.ctypeslib.ndpointer(t, flags="C_CONTIGUOUS"),
                        i64, ctypes.c_void_p, ctypes.c_void_p,
                    ]
                fn = lib.rcm_order
                fn.restype = i64
                fn.argtypes = [i64, i64, p_i64, p_i64, p_i64]
        _lib = lib
        return _lib


def rcm_order(rows, cols, n: int):
    """Reverse Cuthill-McKee ordering of the symmetrized COO pattern.

    Returns the (n,) new-to-old permutation (``perm[i]`` = original index
    of the node at new position ``i``). Native C++ when available;
    falls back to ``scipy.sparse.csgraph.reverse_cuthill_mckee`` (an
    equivalent-quality, not bit-identical, ordering), else None.
    """
    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    lib = load()
    if lib is not None and hasattr(lib, "rcm_order"):
        perm = np.empty(n, np.int64)
        rc = lib.rcm_order(n, len(rows), rows, cols, perm)
        if rc < 0:
            raise ValueError("COO indices out of range")
        return perm
    try:
        import scipy.sparse
        import scipy.sparse.csgraph as csg
    except ImportError:
        return None
    pattern = scipy.sparse.coo_matrix(
        (np.ones(len(rows), np.int8), (rows, cols)), shape=(n, n)).tocsr()
    return np.asarray(csg.reverse_cuthill_mckee(pattern, symmetric_mode=True),
                      np.int64)


def ell_from_coo(rows, cols, vals, n: int, pad_width: Optional[int] = None):
    """Native COO -> padded-ELL assembly; returns (indices, values) or
    None when the native library is unavailable or the dtype unsupported."""
    lib = load()
    if lib is None:
        return None
    vals = np.ascontiguousarray(vals)
    if vals.dtype == np.float64:
        fn = lib.ell_from_coo_f64
    elif vals.dtype == np.float32:
        fn = lib.ell_from_coo_f32
    else:
        return None
    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    nnz = len(rows)
    needed = fn(n, nnz, rows, cols, vals, 0, None, None)
    if needed < 0:
        raise ValueError("COO indices out of range")
    L = max(int(needed), 1)
    if pad_width is not None:
        if pad_width < needed:
            raise ValueError(
                f"pad_width={pad_width} < max row nnz {needed}")
        L = max(pad_width, 1)
    indices = np.empty((n, L), np.int32)
    values = np.empty((n, L), vals.dtype)
    rc = fn(n, nnz, rows, cols, vals, L,
            indices.ctypes.data_as(ctypes.c_void_p),
            values.ctypes.data_as(ctypes.c_void_p))
    if rc < 0:
        raise ValueError("COO indices out of range")
    return indices, values
