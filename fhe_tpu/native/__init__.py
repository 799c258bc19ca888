"""Native (C++) runtime components, loaded via ctypes.

The compute path is JAX/XLA/Pallas; these components cover the host-side
runtime the reference implements in C++ (big-int CRT codec backing
encode/decode -- the role of the reference's math HAL big-integer
backends, src/core/include/math/hal/bigintfxd).  Compiled on demand with
g++ and cached next to the source; pure-Python fallbacks keep the
framework usable without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libcrt_codec.so")
_SRC = os.path.join(_DIR, "crt_codec.cpp")

_lib = None
_tried = False


def _build():
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
        check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native codec; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.crt_center_mod.argtypes = [u32p, u32p, ctypes.c_int,
                                       ctypes.c_int, ctypes.c_uint64, i64p]
        lib.crt_center_double.argtypes = [u32p, u32p, ctypes.c_int,
                                          ctypes.c_int, f64p]
        lib.crt_scale_round_mod.argtypes = [u32p, u32p, ctypes.c_int,
                                            ctypes.c_int, ctypes.c_uint64,
                                            i64p]
        lib.signed_to_residues.argtypes = [i64p, u32p, ctypes.c_int,
                                           ctypes.c_int, u32p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _as_u32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def crt_center_mod(residues: np.ndarray, mods, t: int) -> np.ndarray | None:
    """[L, N] residues -> centered(x) mod t as int64 [N]; None if no lib."""
    lib = get_lib()
    if lib is None:
        return None
    res = np.ascontiguousarray(residues, dtype=np.uint32)
    L, N = res.shape
    m = np.ascontiguousarray(np.asarray(mods, dtype=np.uint32))
    out = np.empty(N, dtype=np.int64)
    lib.crt_center_mod(_as_u32p(res), _as_u32p(m), L, N, t,
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def crt_center_double(residues: np.ndarray, mods) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    res = np.ascontiguousarray(residues, dtype=np.uint32)
    L, N = res.shape
    m = np.ascontiguousarray(np.asarray(mods, dtype=np.uint32))
    out = np.empty(N, dtype=np.float64)
    lib.crt_center_double(_as_u32p(res), _as_u32p(m), L, N,
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def crt_scale_round_mod(residues: np.ndarray, mods, t: int
                        ) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    res = np.ascontiguousarray(residues, dtype=np.uint32)
    L, N = res.shape
    m = np.ascontiguousarray(np.asarray(mods, dtype=np.uint32))
    out = np.empty(N, dtype=np.int64)
    lib.crt_scale_round_mod(
        _as_u32p(res), _as_u32p(m), L, N, t,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out
