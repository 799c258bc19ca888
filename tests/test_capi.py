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


# ---------------------------------------------------------------------------
# ckks_* ABI (reference: go/ckks/bridge.cpp:33-234) — the surface behind
# the Go ckks package (bindings/go/ckks/ckks.go).
# ---------------------------------------------------------------------------

class TestCkksAbi:
    @pytest.fixture(scope="class")
    def cstack(self, lib):
        # log_n=8 (N=256), ~2^104 chain, delta=2^26 -> small fast chain
        ctx = lib.ckks_context_new(8, 104, float(1 << 26))
        assert ctx
        kp = lib.ckks_keygen(ctx)
        assert kp
        return ctx, kp

    def _dec(self, lib, ctx, kp, ct, n):
        out_len = ctypes.c_int()
        p = lib.ckks_decrypt(ctx, kp, ct, ctypes.byref(out_len))
        assert p
        vals = np.array([p[i] for i in range(min(n, out_len.value))])
        capi.libc_free(p)
        return vals

    def _enc(self, lib, ctx, kp, vals):
        arr = (ctypes.c_double * len(vals))(*vals)
        ct = lib.ckks_encrypt(ctx, kp, arr, len(vals))
        assert ct
        return ct

    def test_roundtrip_add_sub_mult(self, lib, cstack):
        ctx, kp = cstack
        a = [0.5, -1.25, 2.0, 3.0]
        b = [1.0, 0.25, -0.5, 2.0]
        ca, cb = self._enc(lib, ctx, kp, a), self._enc(lib, ctx, kp, b)
        got = self._dec(lib, ctx, kp, ca, 4)
        assert np.abs(got - a).max() < 1e-3
        cadd = lib.ckks_add(ctx, ca, cb)
        assert np.abs(self._dec(lib, ctx, kp, cadd, 4)
                      - (np.array(a) + b)).max() < 1e-3
        csub = lib.ckks_sub(ctx, ca, cb)
        assert np.abs(self._dec(lib, ctx, kp, csub, 4)
                      - (np.array(a) - b)).max() < 1e-3
        cmul = lib.ckks_mult_kp(ctx, kp, ca, cb)
        assert np.abs(self._dec(lib, ctx, kp, cmul, 4)
                      - np.array(a) * b).max() < 1e-2
        # reference-ABI 3-arg form resolves the context's registered key
        cmul3 = lib.ckks_mult(ctx, ca, cb)
        assert np.abs(self._dec(lib, ctx, kp, cmul3, 4)
                      - np.array(a) * b).max() < 1e-2
        for c in (cadd, csub, cmul, cmul3):
            lib.ckks_ciphertext_free(c)

    def test_context_levels_accessor(self, lib, cstack):
        ctx, _kp = cstack
        # log_q=104, delta=2^26 -> 104//26 - 1 = 3 levels, visible to callers
        assert lib.ckks_context_levels(ctx) == 3
        # out-of-range parameters are rejected, not silently rewritten
        assert not lib.ckks_context_new(8, 104, 0.5)
        assert not lib.ckks_context_new(8, 30, float(1 << 26))

    def test_deserialize_validates_context(self, lib, cstack):
        ctx, kp = cstack
        ct = self._enc(lib, ctx, kp, [1.0])
        n = ctypes.c_int()
        data = lib.ckks_serialize_ciphertext(ct, ctypes.byref(n))
        raw = bytes(bytearray(ctypes.cast(
            data, ctypes.POINTER(ctypes.c_uint8 * n.value)).contents))
        lib.lux_fhe_bytes_free(data)
        # garbage blob and a mismatched-context blob both fail cleanly
        junk = (ctypes.c_uint8 * 8)(*b"notactx!")
        assert not lib.ckks_deserialize_ciphertext(
            ctx, ctypes.cast(junk, capi._u8p), 8)
        other = lib.ckks_context_new(9, 104, float(1 << 26))  # N=512 != 256
        assert other
        buf = (ctypes.c_uint8 * len(raw)).from_buffer_copy(raw)
        assert not lib.ckks_deserialize_ciphertext(
            other, ctypes.cast(buf, capi._u8p), len(raw))
        lib.ckks_context_free(other)

    def test_rotate_stock_and_lazy(self, lib, cstack):
        ctx, kp = cstack
        vals = [float(i) for i in range(8)]
        ct = self._enc(lib, ctx, kp, vals)
        r1 = lib.ckks_rotate(ctx, kp, ct, 1)       # stock key
        assert abs(self._dec(lib, ctx, kp, r1, 1)[0] - 1.0) < 1e-3
        r3 = lib.ckks_rotate(ctx, kp, ct, 3)       # lazily generated key
        assert abs(self._dec(lib, ctx, kp, r3, 1)[0] - 3.0) < 1e-3
        lib.ckks_ciphertext_free(r1)
        lib.ckks_ciphertext_free(r3)

    def test_serialize_roundtrip(self, lib, cstack):
        ctx, kp = cstack
        ct = self._enc(lib, ctx, kp, [1.5, -2.5])
        n = ctypes.c_int()
        data = lib.ckks_serialize_ciphertext(ct, ctypes.byref(n))
        assert data and n.value > 0
        raw = bytes(bytearray(ctypes.cast(
            data, ctypes.POINTER(ctypes.c_uint8 * n.value)).contents))
        lib.lux_fhe_bytes_free(data)
        buf = (ctypes.c_uint8 * len(raw)).from_buffer_copy(raw)
        back = lib.ckks_deserialize_ciphertext(
            ctx, ctypes.cast(buf, capi._u8p), len(raw))
        assert back
        got = self._dec(lib, ctx, kp, back, 2)
        assert np.abs(got - [1.5, -2.5]).max() < 1e-3

    def test_null_arguments_rejected(self, lib, cstack):
        ctx, kp = cstack
        assert not lib.ckks_keygen(None)
        assert not lib.ckks_add(ctx, None, None)
        out_len = ctypes.c_int()
        assert not lib.ckks_decrypt(ctx, kp, None, ctypes.byref(out_len))


@pytest.mark.slow
def test_ckks_abi_bootstrap(lib):
    """ckks_bootstrap end-to-end (the reference bridge's always-fails op,
    bridge.cpp:182-195, working here): 13-limb composite chain, exhaust
    levels, refresh, decrypt."""
    ctx = lib.ckks_context_new(7, 390, float(1 << 52))
    assert ctx
    kp = lib.ckks_keygen(ctx)
    assert kp
    vals = [0.25, -0.5, 0.125]
    arr = (ctypes.c_double * len(vals))(*vals)
    ct = lib.ckks_encrypt(ctx, kp, arr, len(vals))
    assert ct
    out = lib.ckks_bootstrap(ctx, kp, ct)
    assert out
    out_len = ctypes.c_int()
    p = lib.ckks_decrypt(ctx, kp, out, ctypes.byref(out_len))
    assert p
    got = np.array([p[i] for i in range(3)])
    capi.libc_free(p)
    assert np.abs(got - vals).max() < 2e-2


def test_threshold_abi(lib, stack):
    """lux_fhe_threshold_* (go/threshold stub in the reference; real
    Shamir/sigma-protocol pipeline here): 3-of-3 additive split of the
    context secret, quorum decrypt succeeds, short quorum errors."""
    ctx, sk, _bsk = stack
    sh = ctypes.c_void_p()
    assert lib.lux_fhe_threshold_keygen(ctx, sk, 3, 3, b"additive",
                                        ctypes.byref(sh)) == 0
    assert lib.lux_fhe_threshold_parties(sh) == 3
    ct = _enc(lib, ctx, sk, 1)
    ids = (ctypes.c_int32 * 3)(1, 2, 3)
    out = ctypes.c_int()
    assert lib.lux_fhe_threshold_decrypt(ctx, sh, ct, ids, 3,
                                         ctypes.byref(out)) == 0
    assert out.value == 1
    # short quorum: additive needs all parties
    ids2 = (ctypes.c_int32 * 2)(1, 2)
    rc = lib.lux_fhe_threshold_decrypt(ctx, sh, ct, ids2, 2,
                                       ctypes.byref(out))
    assert rc != 0
    lib.lux_fhe_threshold_free(sh)


def test_threshold_abi_shamir_unavailable(lib, stack):
    """Shamir sharing needs a prime share modulus; every ABI context has a
    power-of-two LWE modulus q, so scheme="shamir" must fail with a keygen
    error (documented limitation -- bindings/go/threshold/threshold.go).
    Shamir on prime-Q extended ciphertexts is covered in-process by
    tests/test_threshold.py."""
    ctx, sk, _bsk = stack
    sh = ctypes.c_void_p()
    rc = lib.lux_fhe_threshold_keygen(ctx, sk, 2, 3, b"shamir",
                                      ctypes.byref(sh))
    assert rc != 0
