"""Native (C++) host library loader.

Compiles ``hostlib.cpp`` on first use with g++ (cached next to the source)
and exposes its functions through ctypes.  Everything here has a pure
numpy/python fallback at the call site — ``lib()`` returns None when no
toolchain is available, and callers fall back silently.

This is the TPU-framework counterpart of the reference's C++ host-side
setup code (mesh/graph loops); the hot *solve* path stays in XLA/Pallas.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "hostlib.cpp")
_SO = os.path.join(_HERE, "_hostlib.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", _SO + ".tmp", _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_SO + ".tmp", _SO)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def lib():
    """The loaded ctypes library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("FVM_TPU_NO_NATIVE"):
            return None
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _compile():
                return None
        try:
            L = ctypes.CDLL(_SO)
        except OSError:
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        L.fvm_aggregate.restype = ctypes.c_int64
        L.fvm_aggregate.argtypes = [ctypes.c_int64, ctypes.c_int64, i64p, u8p, i64p]
        L.fvm_greedy_color.restype = ctypes.c_int64
        L.fvm_greedy_color.argtypes = [ctypes.c_int64, ctypes.c_int64, i64p, u8p, i64p]
        L.fvm_cf_build.restype = None
        L.fvm_cf_build.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            i64p, i64p, u8p, i64p, u8p, u8p, i64p,
        ]
        _lib = L
        return _lib


def _as_i64(a):
    return np.ascontiguousarray(a, dtype=np.int64)


def _as_u8(a):
    return np.ascontiguousarray(a, dtype=np.uint8)


def aggregate(cols: np.ndarray, mask: np.ndarray):
    """Greedy aggregation via the native lib; returns agg array or None."""
    L = lib()
    if L is None:
        return None
    n, K = cols.shape
    c = _as_i64(cols)
    m = _as_u8(mask)
    out = np.empty(n, dtype=np.int64)
    L.fvm_aggregate(
        n, K,
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out


def cf_build(owner, nbr, face_valid, n_cells: int, K: int):
    """Cell->face ELL tables via the native lib (see hostlib.cpp
    fvm_cf_build); returns (cf_face, cf_mask, cf_is_owner, cf_nbr) or
    None when no native toolchain is available."""
    import ctypes

    L = lib()
    if L is None:
        return None
    nf = int(owner.shape[0])
    o = _as_i64(owner)
    nb = _as_i64(nbr)
    fv = None if face_valid is None else _as_u8(face_valid)
    cf_face = np.empty((n_cells, K), dtype=np.int64)
    cf_mask = np.empty((n_cells, K), dtype=np.uint8)
    cf_own = np.empty((n_cells, K), dtype=np.uint8)
    cf_nbr = np.empty((n_cells, K), dtype=np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    L.fvm_cf_build(
        n_cells, nf, K,
        o.ctypes.data_as(i64p),
        nb.ctypes.data_as(i64p),
        fv.ctypes.data_as(u8p) if fv is not None else None,
        cf_face.ctypes.data_as(i64p),
        cf_mask.ctypes.data_as(u8p),
        cf_own.ctypes.data_as(u8p),
        cf_nbr.ctypes.data_as(i64p),
    )
    return (
        cf_face,
        cf_mask.astype(bool),
        cf_own.astype(bool),
        cf_nbr,
    )


def greedy_color(cols: np.ndarray, mask: np.ndarray):
    """Greedy coloring via the native lib; returns color array or None."""
    L = lib()
    if L is None:
        return None
    n, K = cols.shape
    c = _as_i64(cols)
    m = _as_u8(mask)
    out = np.empty(n, dtype=np.int64)
    L.fvm_greedy_color(
        n, K,
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out
