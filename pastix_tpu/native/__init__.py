"""Native (C++) host components, loaded via ctypes.

The reference's host-side runtime is C (ordering via external Scotch,
symbolic/blend in-tree — SURVEY.md sections 1-2); our equivalents compile
on first use with the system g++ (no pybind11 in this environment) and
fall back to the pure-Python implementations if no toolchain is present.

Set ``PASTIX_TPU_NO_NATIVE=1`` to force the Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_LIB = None
_TRIED = False

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_SOURCES = ["ordering.cpp"]


def _build(so_path: str) -> bool:
    srcs = [os.path.join(_SRC_DIR, s) for s in _SOURCES]
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-o", so_path, *srcs,
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if r.returncode != 0:
        # retry without -march=native (portability)
        cmd.remove("-march=native")
        try:
            r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
        except (OSError, subprocess.TimeoutExpired):
            return False
    if r.returncode != 0:
        print(f"[pastix-tpu] native build failed:\n{r.stderr}", file=sys.stderr)
        return False
    return True


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("PASTIX_TPU_NO_NATIVE"):
        return None
    so_path = os.path.join(_SRC_DIR, "_pastix_native.so")
    src_mtime = max(
        os.path.getmtime(os.path.join(_SRC_DIR, s)) for s in _SOURCES
    )
    if not os.path.exists(so_path) or os.path.getmtime(so_path) < src_mtime:
        if not _build(so_path):
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.pastix_nd.restype = ctypes.c_int64
    lib.pastix_nd.argtypes = [
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),  # indptr
        ctypes.POINTER(ctypes.c_int64),  # indices
        ctypes.c_int64,  # leaf_size
        ctypes.c_int64,  # max_levels
        ctypes.c_double,  # balance
        ctypes.POINTER(ctypes.c_int64),  # peritab out
        ctypes.POINTER(ctypes.c_int64),  # rangtab out
        ctypes.POINTER(ctypes.c_int64),  # nrang out
    ]
    if lib.pastix_native_abi() != 1:
        return None
    _LIB = lib
    return _LIB


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def native_nested_dissection(pattern, leaf_size=64, max_levels=64,
                             balance=0.28):
    """C++ ND on a scipy symmetric pattern; returns (peritab, rangtab) or
    None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    import scipy.sparse as sp

    adj = sp.csr_matrix(pattern.astype(bool))
    adj.setdiag(False)
    adj.eliminate_zeros()
    n = adj.shape[0]
    indptr = np.ascontiguousarray(adj.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(adj.indices, dtype=np.int64)
    peritab = np.empty(n, dtype=np.int64)
    rangtab = np.empty(n + 1, dtype=np.int64)
    nrang = np.zeros(1, dtype=np.int64)
    rc = lib.pastix_nd(
        n, _i64p(indptr), _i64p(indices),
        int(leaf_size), int(max_levels), float(balance),
        _i64p(peritab), _i64p(rangtab), _i64p(nrang),
    )
    if rc != 0:
        return None
    return peritab, rangtab[: int(nrang[0])].copy()
