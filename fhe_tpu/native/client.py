"""ctypes bindings for the native client library (client.cpp): BLAKE2b
CSPRNG, LWE keygen/encrypt/decrypt with the exact ciphertext layout of
fhe_tpu.tfhe.lwe -- the framework's equivalent of the reference's
lux_fhe_* C ABI (src/c_api/c_api.cpp) + Blake2Engine
(utils/prng/blake2engine.h)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libfheclient.so")
_SRC = os.path.join(_DIR, "client.cpp")

_lib = None
_tried = False

_u8p = ctypes.POINTER(ctypes.c_uint8)
_u32p = ctypes.POINTER(ctypes.c_uint32)
_u64p = ctypes.POINTER(ctypes.c_uint64)
_i32p = ctypes.POINTER(ctypes.c_int32)
_i64p = ctypes.POINTER(ctypes.c_int64)


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 _SRC, "-o", _SO],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.fhe_client_version.restype = ctypes.c_int
        lib.fhe_blake2b.argtypes = [_u8p, ctypes.c_int64, _u8p,
                                    ctypes.c_int]
        lib.fhe_prng_uniform.argtypes = [_u8p, ctypes.c_uint64,
                                         ctypes.c_uint64, _u64p,
                                         ctypes.c_int64]
        lib.fhe_prng_gaussian.argtypes = [_u8p, ctypes.c_uint64,
                                          ctypes.c_double, _i64p,
                                          ctypes.c_int64]
        lib.fhe_lwe_keygen.argtypes = [_u8p, ctypes.c_int, _i32p]
        lib.fhe_lwe_encrypt.argtypes = [_i32p, ctypes.c_int,
                                        ctypes.c_uint64, ctypes.c_int,
                                        _i32p, ctypes.c_int64, _u8p,
                                        ctypes.c_double, _u32p, _u32p]
        lib.fhe_lwe_decrypt.argtypes = [_i32p, ctypes.c_int,
                                        ctypes.c_uint64, ctypes.c_int,
                                        _u32p, _u32p, ctypes.c_int64,
                                        _i32p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _p(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def blake2b(data: bytes, outlen: int = 32) -> bytes:
    lib = get_lib()
    buf = np.frombuffer(data, dtype=np.uint8).copy()
    if buf.size == 0:
        buf = np.zeros(1, dtype=np.uint8)
    out = np.zeros(outlen, dtype=np.uint8)
    lib.fhe_blake2b(_p(buf, ctypes.c_uint8), len(data),
                    _p(out, ctypes.c_uint8), outlen)
    return out.tobytes()


def prng_uniform(seed: bytes, stream: int, q: int, count: int) -> np.ndarray:
    lib = get_lib()
    s = np.frombuffer(seed, dtype=np.uint8).copy()
    out = np.zeros(count, dtype=np.uint64)
    lib.fhe_prng_uniform(_p(s, ctypes.c_uint8), stream, q,
                         _p(out, ctypes.c_uint64), count)
    return out


def prng_gaussian(seed: bytes, stream: int, std: float,
                  count: int) -> np.ndarray:
    lib = get_lib()
    s = np.frombuffer(seed, dtype=np.uint8).copy()
    out = np.zeros(count, dtype=np.int64)
    lib.fhe_prng_gaussian(_p(s, ctypes.c_uint8), stream, std,
                          _p(out, ctypes.c_int64), count)
    return out


def lwe_keygen(seed: bytes, n: int) -> np.ndarray:
    lib = get_lib()
    s = np.frombuffer(seed, dtype=np.uint8).copy()
    sk = np.zeros(n, dtype=np.int32)
    lib.fhe_lwe_keygen(_p(s, ctypes.c_uint8), n, _p(sk, ctypes.c_int32))
    return sk


def lwe_encrypt(sk: np.ndarray, q: int, p: int, m: np.ndarray,
                seed: bytes, std: float = 3.19):
    lib = get_lib()
    sk = np.ascontiguousarray(sk, dtype=np.int32)
    m = np.ascontiguousarray(m, dtype=np.int32)
    s = np.frombuffer(seed, dtype=np.uint8).copy()
    n, batch = len(sk), len(m)
    a = np.zeros((batch, n), dtype=np.uint32)
    b = np.zeros(batch, dtype=np.uint32)
    lib.fhe_lwe_encrypt(_p(sk, ctypes.c_int32), n, q, p,
                        _p(m, ctypes.c_int32), batch,
                        _p(s, ctypes.c_uint8), std,
                        _p(a, ctypes.c_uint32), _p(b, ctypes.c_uint32))
    return a, b


def lwe_decrypt(sk: np.ndarray, q: int, p: int, a: np.ndarray,
                b: np.ndarray) -> np.ndarray:
    lib = get_lib()
    sk = np.ascontiguousarray(sk, dtype=np.int32)
    a = np.ascontiguousarray(a, dtype=np.uint32)
    b = np.ascontiguousarray(b, dtype=np.uint32)
    batch = len(b)
    m = np.zeros(batch, dtype=np.int32)
    lib.fhe_lwe_decrypt(_p(sk, ctypes.c_int32), a.shape[1], q, p,
                        _p(a, ctypes.c_uint32), _p(b, ctypes.c_uint32),
                        batch, _p(m, ctypes.c_int32))
    return m
