"""Native (C++) host-side components, bound via ctypes.

The compute path is JAX/XLA/Pallas; these are the performance-critical
*host* pieces: the blocked-ELL graph packer (and, over time, partitioners
and data loaders). Each has a behaviour-identical Python fallback — the
build is lazy (first import compiles with g++ into ``_libstgcn.so``) and
failures degrade gracefully to the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_libstgcn.so")
_SRC = [os.path.join(_DIR, "packing.cpp")]

_lib = None
_build_error: str | None = None


def _build() -> None:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _SO, *_SRC]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _load():
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return _lib
    try:
        src_mtime = max(os.path.getmtime(s) for s in _SRC)
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < src_mtime:
            _build()
        lib = ctypes.CDLL(_SO)
        lib.bcsr_analyze.restype = ctypes.c_int
        lib.bcsr_analyze.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_void_p]
        lib.bcsr_pack.restype = None
        lib.bcsr_pack.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        _lib = lib
    except Exception as e:  # no toolchain / build failure → fallback
        _build_error = f"{type(e).__name__}: {e}"
        print(f"[stgcn_tpu.native] build unavailable ({_build_error}); "
              "using python fallbacks", file=sys.stderr)
    return _lib


def available() -> bool:
    return _load() is not None


def pack_bcsr_native(indptr: np.ndarray, indices: np.ndarray, vals: np.ndarray,
                     n_rows: int, n_cols: int, block_size: int
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """Blocked-ELL pack from raw CSR arrays; None if the library is absent."""
    lib = _load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, np.int32)
    indices = np.ascontiguousarray(indices, np.int32)
    vals = np.ascontiguousarray(vals, np.float32)
    nbr = -(-n_rows // block_size)
    counts = np.zeros(nbr, np.int32)
    max_b = lib.bcsr_analyze(indptr.ctypes.data, indices.ctypes.data,
                             n_rows, n_cols, block_size, counts.ctypes.data)
    max_b = max(int(max_b), 1)
    data = np.zeros((nbr, max_b, block_size, block_size), np.float32)
    cols = np.zeros((nbr, max_b), np.int32)
    lib.bcsr_pack(indptr.ctypes.data, indices.ctypes.data, vals.ctypes.data,
                  n_rows, n_cols, block_size, max_b,
                  data.ctypes.data, cols.ctypes.data, counts.ctypes.data)
    return data, cols, counts
