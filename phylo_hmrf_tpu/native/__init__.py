"""Native (C++) host-side components: lazy build + ctypes bindings.

The shared library is compiled on first use with g++ (no pybind11 in this
image; the C ABI + ctypes keeps the binding dependency-free). Rebuilds happen
automatically when a source file is newer than the cached .so.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SOURCES = ["maxflow.cc", "gridops.cc"]
_LIB_NAME = "libphylo_native.so"
_lock = threading.Lock()
_lib = None


class NativeBuildError(RuntimeError):
    pass


def _needs_build(lib_path: str, sources) -> bool:
    if not os.path.exists(lib_path):
        return True
    lib_mtime = os.path.getmtime(lib_path)
    return any(os.path.getmtime(s) > lib_mtime for s in sources)


def build(force: bool = False) -> str:
    """Compile the native library if needed; returns its path."""
    lib_path = os.path.join(_DIR, _LIB_NAME)
    sources = [os.path.join(_DIR, s) for s in _SOURCES
               if os.path.exists(os.path.join(_DIR, s))]
    if not sources:
        raise NativeBuildError("no native sources found")
    if force or _needs_build(lib_path, sources):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", "-o", lib_path] + sources
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except FileNotFoundError as e:
            raise NativeBuildError("g++ not available") from e
        except subprocess.CalledProcessError as e:
            raise NativeBuildError(f"native build failed:\n{e.stderr}") from e
    return lib_path


def load() -> ctypes.CDLL:
    """Build (if needed) and load the native library; cached per process."""
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(build())
            i64p = ctypes.POINTER(ctypes.c_int64)
            f64p = ctypes.POINTER(ctypes.c_double)
            i32p = ctypes.POINTER(ctypes.c_int32)

            lib.phmrf_potts_energy.restype = ctypes.c_double
            lib.phmrf_potts_energy.argtypes = [
                ctypes.c_int64, ctypes.c_int64, i64p, f64p, f64p,
                ctypes.c_int32, ctypes.c_double, i32p]
            lib.phmrf_potts_swap.restype = ctypes.c_int32
            lib.phmrf_potts_swap.argtypes = [
                ctypes.c_int64, ctypes.c_int64, i64p, f64p, f64p,
                ctypes.c_int32, ctypes.c_double, ctypes.c_int32, i32p]
            lib.phmrf_potts_expansion.restype = ctypes.c_int32
            lib.phmrf_potts_expansion.argtypes = [
                ctypes.c_int64, ctypes.c_int64, i64p, f64p, f64p,
                ctypes.c_int32, ctypes.c_double, ctypes.c_int32, i32p]
            if hasattr(lib, "phmrf_hole_fill_sym"):
                lib.phmrf_hole_fill_sym.restype = None
                lib.phmrf_hole_fill_sym.argtypes = [
                    f64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
                    ctypes.c_int32]
            _lib = lib
    return _lib


def available() -> bool:
    try:
        load()
        return True
    except NativeBuildError:
        return False


def _as_c(arr, dtype, ptr_type):
    a = np.ascontiguousarray(arr, dtype=dtype)
    return a, a.ctypes.data_as(ptr_type)


def potts_energy(edges: np.ndarray, weights: np.ndarray, unary: np.ndarray,
                 beta: float, labels: np.ndarray) -> float:
    """Exact weighted-Potts energy on a general graph (double precision)."""
    lib = load()
    n, k = unary.shape
    e = edges.shape[0]
    edges_c, edges_p = _as_c(edges[:, :2], np.int64,
                             ctypes.POINTER(ctypes.c_int64))
    w_c, w_p = _as_c(weights, np.float64, ctypes.POINTER(ctypes.c_double))
    u_c, u_p = _as_c(unary, np.float64, ctypes.POINTER(ctypes.c_double))
    l_c, l_p = _as_c(labels, np.int32, ctypes.POINTER(ctypes.c_int32))
    return lib.phmrf_potts_energy(n, e, edges_p, w_p, u_p, k, beta, l_p)


def potts_swap(edges: np.ndarray, weights: np.ndarray, unary: np.ndarray,
               beta: float, init_labels: np.ndarray,
               max_cycles: int = 5000) -> np.ndarray:
    """Exact alpha-beta swap on a general graph. Plays the role of
    `pygco.cut_general_graph(..., algorithm='swap')` in the reference
    (`phylo_hmrf.py:496`), in double precision."""
    lib = load()
    n, k = unary.shape
    e = edges.shape[0]
    edges_c, edges_p = _as_c(edges[:, :2], np.int64,
                             ctypes.POINTER(ctypes.c_int64))
    w_c, w_p = _as_c(weights, np.float64, ctypes.POINTER(ctypes.c_double))
    u_c, u_p = _as_c(unary, np.float64, ctypes.POINTER(ctypes.c_double))
    labels = np.ascontiguousarray(init_labels, dtype=np.int32).copy()
    l_p = labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    lib.phmrf_potts_swap(n, e, edges_p, w_p, u_p, k, beta,
                         max_cycles, l_p)
    return labels


def potts_expansion(edges: np.ndarray, weights: np.ndarray, unary: np.ndarray,
                    beta: float, init_labels: np.ndarray,
                    max_cycles: int = 5000) -> np.ndarray:
    """Exact alpha-expansion on a general graph (the reference ships it in
    GCO alongside swap, `gco_source/GCoptimization.cpp:965-1199`)."""
    lib = load()
    n, k = unary.shape
    e = edges.shape[0]
    edges_c, edges_p = _as_c(edges[:, :2], np.int64,
                             ctypes.POINTER(ctypes.c_int64))
    w_c, w_p = _as_c(weights, np.float64, ctypes.POINTER(ctypes.c_double))
    u_c, u_p = _as_c(unary, np.float64, ctypes.POINTER(ctypes.c_double))
    labels = np.ascontiguousarray(init_labels, dtype=np.int32).copy()
    l_p = labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    lib.phmrf_potts_expansion(n, e, edges_p, w_p, u_p, k, beta,
                              max_cycles, l_p)
    return labels
