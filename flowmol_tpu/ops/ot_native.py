"""ctypes binding for the native OT-coupling library (csrc/ot_coupling.cpp).

Compiles the shared library on first use (g++, cached next to the source) and
falls back to the scipy path in data/priors.py when the toolchain or binary
is unavailable.  API mirrors the host-side coupling the reference runs in its
DataLoader workers (priors.py:109-169).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).parent.parent.parent / "csrc" / "ot_coupling.cpp"
_LIB = _SRC.parent / "_ot_native.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-std=c++17", "-pthread", "-o", str(_LIB), str(_SRC)],
            check=True, capture_output=True)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SRC.exists():
        return None
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None
    lib.fm_hungarian.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int)]
    lib.fm_kabsch.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int]
    lib.fm_couple_batch.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def hungarian(cost: np.ndarray) -> np.ndarray:
    """Column assignment per row for a square cost matrix (minimization)."""
    lib = load()
    n = cost.shape[0]
    cost = np.ascontiguousarray(cost, np.float64)
    out = np.zeros(n, np.int32)
    lib.fm_hungarian(_dptr(cost), n,
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return out.astype(np.int64)


def kabsch(x0: np.ndarray, x1: np.ndarray) -> np.ndarray:
    """Rotate+translate x0 onto x1 (reference-parity Kabsch, R = V U^T)."""
    lib = load()
    out = np.ascontiguousarray(x0, np.float64).copy()
    x1 = np.ascontiguousarray(x1, np.float64)
    lib.fm_kabsch(_dptr(out), _dptr(x1), x0.shape[0])
    return out


def couple_batch(priors: np.ndarray, dsts: np.ndarray, ns: np.ndarray,
                 rigid_body: bool = True, n_threads: int = 0) -> np.ndarray:
    """Threaded batched OT coupling over a padded (M, N_max, D) slab.

    Permutes each molecule's prior rows by the Hungarian assignment against
    its dst and (optionally) Kabsch-aligns.  Returns the coupled priors.
    """
    lib = load()
    priors = np.ascontiguousarray(priors, np.float64).copy()
    dsts = np.ascontiguousarray(dsts, np.float64)
    ns = np.ascontiguousarray(ns, np.int32)
    n_mols, max_n, dim = priors.shape
    lib.fm_couple_batch(
        _dptr(priors), _dptr(dsts),
        ns.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_mols, max_n, dim, int(rigid_body), n_threads)
    return priors
