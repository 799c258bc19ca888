"""Coefficient-packed and string encodings (encoding/coefpackedencoding.h
+ encoding/stringencoding.h analogues): raw codec roundtrips, and
encrypted roundtrips + homomorphic coefficient-wise add through the BGV
and BFV contexts."""

import numpy as np
import pytest

from fhe_tpu.pke import encodings as enc
from fhe_tpu.pke.bgv import BgvContext
from fhe_tpu.pke.bfv import BfvContext


def test_coef_packed_codec():
    t = 65537
    v = np.array([0, 1, -1, 5, -300, 32768, -32768])
    c = enc.encode_coef_packed(v, t, 16)
    assert c.shape == (16,)
    back = enc.decode_coef_packed(c, t, length=len(v))
    np.testing.assert_array_equal(back, v)
    with pytest.raises(ValueError):
        enc.encode_coef_packed(np.arange(17), t, 16)
    with pytest.raises(ValueError):
        enc.encode_coef_packed([t + 1], t, 16)


def test_string_codec():
    s = "Hello, FHE!"
    c = enc.encode_string(s, 32)
    assert enc.decode_string(c) == s
    with pytest.raises(ValueError):
        enc.encode_string("x" * 33, 32)
    with pytest.raises(ValueError):
        enc.encode_string("x", 32, t=65537)


def test_bgv_coef_packed_roundtrip_and_add(rng):
    ctx = BgvContext.create(N=256, num_levels=2)
    sk, pk = ctx.keygen(rng)
    a = rng.integers(-100, 100, size=50)
    b = rng.integers(-100, 100, size=50)
    ca = ctx.encrypt(pk, a, rng, encoding="coef")
    cb = ctx.encrypt(pk, b, rng, encoding="coef")
    got = ctx.decrypt(sk, ca, encoding="coef")
    np.testing.assert_array_equal(got[:50], a)
    s = ctx.add(ca, cb)
    np.testing.assert_array_equal(ctx.decrypt(sk, s, encoding="coef")[:50],
                                  a + b)


def test_bfv_string_roundtrip(rng):
    ctx = BfvContext.create(N=256, num_limbs=2, plain_mod=256)
    sk, pk = ctx.keygen(rng)
    msg = "the TPU way"
    ct = ctx.encrypt(pk, msg, rng, encoding="string")
    assert ctx.decrypt(sk, ct, encoding="string") == msg


def test_bfv_coef_packed_add(rng):
    ctx = BfvContext.create(N=256, num_limbs=2)
    sk, pk = ctx.keygen(rng)
    a = rng.integers(-50, 50, size=30)
    ca = ctx.encrypt(pk, a, rng, encoding="coef")
    s = ctx.add(ca, ca)
    np.testing.assert_array_equal(ctx.decrypt(sk, s, encoding="coef")[:30],
                                  2 * a)
