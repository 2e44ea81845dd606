"""ctypes loader for the native host runtime (native/ppcseq_native.cpp).

Every entry point has a NumPy fallback in the pure-Python modules; this
module only decides whether the compiled library is available and exposes
typed wrappers. `available()` is False when the .so has not been built
(`make -C native`), and callers silently use the fallback.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "native", "libppcseq_native.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.abspath(_lib_path())
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.pivot_counts.argtypes = [i64p, i64p, i64p, ctypes.c_int64, ctypes.c_int64, i64p]
    lib.pivot_counts.restype = None
    lib.tmm_factor.argtypes = [f64p, f64p, ctypes.c_int64, ctypes.c_double, ctypes.c_double]
    lib.tmm_factor.restype = ctypes.c_double
    lib.tmm_norm_factors.argtypes = [f64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, f64p]
    lib.tmm_norm_factors.restype = None
    lib.quantile7_sorted.argtypes = [f64p, ctypes.c_int64, ctypes.c_double]
    lib.quantile7_sorted.restype = ctypes.c_double
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def pivot_counts(s_idx: np.ndarray, g_idx: np.ndarray, values: np.ndarray, S: int, G: int):
    lib = _load()
    out = np.zeros((S, G), dtype=np.int64)
    s = np.ascontiguousarray(s_idx, dtype=np.int64)
    g = np.ascontiguousarray(g_idx, dtype=np.int64)
    v = np.ascontiguousarray(values, dtype=np.int64)
    lib.pivot_counts(
        _ptr(s, ctypes.c_int64), _ptr(g, ctypes.c_int64), _ptr(v, ctypes.c_int64),
        len(v), G, _ptr(out, ctypes.c_int64),
    )
    return out


def tmm_norm_factors(counts_genes_by_samples: np.ndarray, ref_column: int) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(counts_genes_by_samples, dtype=np.float64)
    n_genes, n_samples = x.shape
    out = np.zeros(n_samples, dtype=np.float64)
    lib.tmm_norm_factors(
        _ptr(x, ctypes.c_double), n_genes, n_samples, ref_column, _ptr(out, ctypes.c_double)
    )
    return out
