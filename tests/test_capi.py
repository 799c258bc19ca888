"""Full C API tests (c_api.cpp:73-366 analogue): the native
libfhecapi.so drives the whole TFHE stack — context, keygen, encrypt,
gates, mux, bootstrap, marshalling — through opaque C handles, with the
compute running on the JAX path of THIS interpreter (the library joins
the hosting CPython)."""

import ctypes

import numpy as np
import pytest

from fhe_tpu.native import capi


@pytest.fixture(scope="module")
def lib():
    lib = capi.get_lib()
    if lib is None:
        pytest.skip("native capi unavailable (g++/libpython)")
    return lib


def _handle(call, *args):
    out = ctypes.c_void_p()
    rc = call(*args, ctypes.byref(out))
    assert rc == 0, rc
    return out


@pytest.fixture(scope="module")
def stack(lib):
    ctx = _handle(lib.lux_fhe_context_new, b"TOY", b"GINX")
    sk = _handle(lib.lux_fhe_keygen_secret, ctx, 42)
    bsk = _handle(lib.lux_fhe_keygen_bootstrap, ctx, sk)
    return ctx, sk, bsk


def _enc(lib, ctx, sk, bit):
    return _handle(lib.lux_fhe_encrypt, ctx, sk, bit)


def _dec(lib, ctx, sk, ct):
    out = ctypes.c_int()
    assert lib.lux_fhe_decrypt(ctx, sk, ct, ctypes.byref(out)) == 0
    return out.value


def test_version_errors_introspection(lib, stack):
    ctx, _sk, _bsk = stack
    assert lib.lux_fhe_version() == b"1.4.2"
    assert lib.lux_fhe_strerror(0) == b"ok"
    assert b"gate" in lib.lux_fhe_strerror(8)
    assert lib.lux_fhe_has_gpu() in (0, 1)
    assert lib.lux_fhe_context_n(ctx) > 0
    assert lib.lux_fhe_context_ring_dim(ctx) >= lib.lux_fhe_context_n(ctx)
    assert lib.lux_fhe_context_modulus(ctx) > 0
    # null-pointer contract
    assert lib.lux_fhe_context_new(None, None, None) == 1


def test_encrypt_decrypt_gates(lib, stack):
    ctx, sk, bsk = stack
    cts = {b: _enc(lib, ctx, sk, b) for b in (0, 1)}
    for b in (0, 1):
        assert _dec(lib, ctx, sk, cts[b]) == b
    # gate truth tables through the C ABI
    for name, fn in (("and", lib.lux_fhe_and), ("or", lib.lux_fhe_or),
                     ("xor", lib.lux_fhe_xor), ("nand", lib.lux_fhe_nand)):
        want = {"and": lambda a, b: a & b, "or": lambda a, b: a | b,
                "xor": lambda a, b: a ^ b,
                "nand": lambda a, b: 1 - (a & b)}[name]
        for a in (0, 1):
            for b in (0, 1):
                out = _handle(fn, ctx, bsk, cts[a], cts[b])
                assert _dec(lib, ctx, sk, out) == want(a, b), (name, a, b)
                lib.lux_fhe_ciphertext_free(out)


def test_not_mux_bootstrap_clone(lib, stack):
    ctx, sk, bsk = stack
    c0, c1 = _enc(lib, ctx, sk, 0), _enc(lib, ctx, sk, 1)
    n = _handle(lib.lux_fhe_not, ctx, c0)
    assert _dec(lib, ctx, sk, n) == 1
    # mux(sel, a, b) = sel ? a : b
    for sel, want in ((c1, 0), (c0, 1)):
        out = _handle(lib.lux_fhe_mux, ctx, bsk, sel, c0, c1)
        assert _dec(lib, ctx, sk, out) == want
        lib.lux_fhe_ciphertext_free(out)
    bs = _handle(lib.lux_fhe_bootstrap, ctx, bsk, c1)
    assert _dec(lib, ctx, sk, bs) == 1
    cl = _handle(lib.lux_fhe_ciphertext_clone, c1)
    assert _dec(lib, ctx, sk, cl) == 1


def test_public_key_encrypt(lib, stack):
    ctx, sk, bsk = stack
    pk = _handle(lib.lux_fhe_keygen_public, ctx, sk)
    ct = _handle(lib.lux_fhe_encrypt_pk, ctx, pk, sk, 1)
    assert _dec(lib, ctx, sk, ct) == 1
    lib.lux_fhe_publickey_free(pk)


def test_marshal_roundtrip(lib, stack):
    ctx, sk, _bsk = stack
    ct = _enc(lib, ctx, sk, 1)
    data = capi._u8p()
    n = ctypes.c_int64()
    assert lib.lux_fhe_ciphertext_marshal(ct, ctypes.byref(data),
                                          ctypes.byref(n)) == 0
    assert n.value > 0
    raw = bytes(bytearray(ctypes.cast(
        data, ctypes.POINTER(ctypes.c_uint8 * n.value)).contents))
    lib.lux_fhe_bytes_free(data)
    back = ctypes.c_void_p()
    buf = (ctypes.c_uint8 * len(raw)).from_buffer_copy(raw)
    assert lib.lux_fhe_ciphertext_unmarshal(
        ctypes.cast(buf, capi._u8p), len(raw), ctypes.byref(back)) == 0
    assert _dec(lib, ctx, sk, back) == 1
    # secret key roundtrip: unmarshal into a fresh handle, decrypt works
    skd = capi._u8p()
    skn = ctypes.c_int64()
    assert lib.lux_fhe_secretkey_marshal(sk, ctypes.byref(skd),
                                         ctypes.byref(skn)) == 0
    raw_sk = bytes(bytearray(ctypes.cast(
        skd, ctypes.POINTER(ctypes.c_uint8 * skn.value)).contents))
    lib.lux_fhe_bytes_free(skd)
    buf2 = (ctypes.c_uint8 * len(raw_sk)).from_buffer_copy(raw_sk)
    sk2 = ctypes.c_void_p()
    assert lib.lux_fhe_secretkey_unmarshal(
        ctypes.cast(buf2, capi._u8p), len(raw_sk), ctypes.byref(sk2)) == 0
    assert _dec(lib, ctx, sk2, ct) == 1
