"""ctypes loader for the full lux_fhe_* C API (capi.cpp).

Auto-builds libfhecapi.so with g++ on first use (same pattern as
client.py).  The library embeds/joins CPython, so loading it from a
Python process simply routes C calls back into this interpreter's
fhe_tpu.native.capi_impl registries — which is exactly how the Go/cgo
bindings consume it out-of-process too (they link libpython).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libfhecapi.so")
_SRC = os.path.join(_DIR, "capi.cpp")

_lib = None
_tried = False

_u8p = ctypes.POINTER(ctypes.c_uint8)

# process libc free() for malloc'd output buffers (ckks_decrypt doubles)
libc_free = ctypes.CDLL(None).free
libc_free.argtypes = [ctypes.c_void_p]
libc_free.restype = None


def _build_cmd():
    inc = sysconfig.get_paths()["include"]
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           f"-I{inc}", _SRC, "-o", _SO]
    # Link libpython when available so plain C programs can embed; when
    # absent the symbols resolve from the hosting python process.
    libdir = sysconfig.get_config_var("LIBDIR") or ""
    ldlib = sysconfig.get_config_var("LDLIBRARY") or ""
    if ldlib.endswith(".so") and libdir:
        ver = sysconfig.get_config_var("LDVERSION")
        cmd += [f"-L{libdir}", f"-lpython{ver}"]
    return cmd


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(_build_cmd(), check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.lux_fhe_version.restype = ctypes.c_char_p
        lib.lux_fhe_strerror.restype = ctypes.c_char_p
        lib.lux_fhe_strerror.argtypes = [ctypes.c_int]
        lib.lux_fhe_has_gpu.restype = ctypes.c_int
        for name in ("lux_fhe_context_n", "lux_fhe_context_ring_dim",
                     "lux_fhe_context_modulus"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int64
            fn.argtypes = [ctypes.c_void_p]
        lib.lux_fhe_context_new.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_void_p)]
        lib.lux_fhe_keygen_secret.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_void_p)]
        for name in ("lux_fhe_keygen_bootstrap", "lux_fhe_keygen_public"):
            getattr(lib, name).argtypes = [
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_void_p)]
        lib.lux_fhe_ciphertext_clone.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p)]
        lib.lux_fhe_encrypt.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p)]
        lib.lux_fhe_encrypt_pk.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.POINTER(ctypes.c_void_p)]
        lib.lux_fhe_decrypt.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int)]
        for g in ("and", "or", "xor", "nand", "nor", "xnor"):
            getattr(lib, f"lux_fhe_{g}").argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p)]
        lib.lux_fhe_not.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_void_p)]
        lib.lux_fhe_mux.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_void_p)]
        lib.lux_fhe_bootstrap.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_void_p)]
        for name in ("lux_fhe_ciphertext_marshal",
                     "lux_fhe_secretkey_marshal"):
            getattr(lib, name).argtypes = [
                ctypes.c_void_p, ctypes.POINTER(_u8p),
                ctypes.POINTER(ctypes.c_int64)]
        for name in ("lux_fhe_ciphertext_unmarshal",
                     "lux_fhe_secretkey_unmarshal"):
            getattr(lib, name).argtypes = [
                _u8p, ctypes.c_int64, ctypes.POINTER(ctypes.c_void_p)]
        for name in ("lux_fhe_context_free", "lux_fhe_secretkey_free",
                     "lux_fhe_publickey_free", "lux_fhe_bootstrapkey_free",
                     "lux_fhe_ciphertext_free"):
            getattr(lib, name).argtypes = [ctypes.c_void_p]
        lib.lux_fhe_bytes_free.argtypes = [_u8p]
        # ---- threshold ABI (go/threshold parity, working) ----
        lib.lux_fhe_threshold_keygen.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_void_p)]
        lib.lux_fhe_threshold_free.argtypes = [ctypes.c_void_p]
        lib.lux_fhe_threshold_parties.restype = ctypes.c_int
        lib.lux_fhe_threshold_parties.argtypes = [ctypes.c_void_p]
        lib.lux_fhe_threshold_decrypt.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int)]
        # ---- ckks_* ABI (go/ckks bridge parity) ----
        vp = ctypes.c_void_p
        lib.ckks_context_new.restype = vp
        lib.ckks_context_new.argtypes = [ctypes.c_int, ctypes.c_int,
                                         ctypes.c_double]
        lib.ckks_context_free.argtypes = [vp]
        lib.ckks_keygen.restype = vp
        lib.ckks_keygen.argtypes = [vp]
        lib.ckks_keypair_free.argtypes = [vp]
        lib.ckks_encrypt.restype = vp
        lib.ckks_encrypt.argtypes = [vp, vp,
                                     ctypes.POINTER(ctypes.c_double),
                                     ctypes.c_int]
        lib.ckks_decrypt.restype = ctypes.POINTER(ctypes.c_double)
        lib.ckks_decrypt.argtypes = [vp, vp, vp,
                                     ctypes.POINTER(ctypes.c_int)]
        lib.ckks_ciphertext_free.argtypes = [vp]
        for nm in ("ckks_add", "ckks_sub"):
            getattr(lib, nm).restype = vp
            getattr(lib, nm).argtypes = [vp, vp, vp]
        lib.ckks_mult.restype = vp                  # reference 3-arg ABI
        lib.ckks_mult.argtypes = [vp, vp, vp]
        lib.ckks_mult_kp.restype = vp               # explicit-keypair form
        lib.ckks_mult_kp.argtypes = [vp, vp, vp, vp]
        lib.ckks_context_levels.restype = ctypes.c_int
        lib.ckks_context_levels.argtypes = [vp]
        lib.ckks_rotate.restype = vp
        lib.ckks_rotate.argtypes = [vp, vp, vp, ctypes.c_int]
        lib.ckks_bootstrap.restype = vp
        lib.ckks_bootstrap.argtypes = [vp, vp, vp]
        lib.ckks_serialize_ciphertext.restype = _u8p
        lib.ckks_serialize_ciphertext.argtypes = [
            vp, ctypes.POINTER(ctypes.c_int)]
        lib.ckks_deserialize_ciphertext.restype = vp
        lib.ckks_deserialize_ciphertext.argtypes = [vp, _u8p, ctypes.c_int]
        _lib = lib
    except Exception:
        _lib = None
    return _lib
