"""Security hardening tests (UnitTestConstantTime.cpp analogue +
NOISE_FLOODING decrypt)."""

import numpy as np
import pytest

from fhe_tpu.utils import security
from fhe_tpu.pke import ckks


def test_ct_primitives():
    assert security.ct_eq(5, 5) == 1 and security.ct_eq(5, 6) == 0
    assert security.ct_eq(0, 0) == 1
    assert security.ct_lt(3, 7) == 1 and security.ct_lt(7, 3) == 0
    assert security.ct_lt(7, 7) == 0
    assert security.ct_select(1, 11, 22) == 11
    assert security.ct_select(0, 11, 22) == 22
    assert security.ct_memcmp(b"abcd", b"abcd") == 0
    assert security.ct_memcmp(b"abcd", b"abcx") == 1
    assert security.ct_memcmp(b"ab", b"abc") == 1


def test_ct_table_lookup(rng):
    t = rng.integers(0, 1 << 60, size=37).astype(np.uint64)
    for i in (0, 5, 36):
        assert security.ct_table_lookup(t, i) == int(t[i])


def test_ct_select_vec(rng):
    a = rng.integers(0, 100, 16).astype(np.uint64)
    b = rng.integers(0, 100, 16).astype(np.uint64)
    c = rng.integers(0, 2, 16).astype(np.uint64)
    got = security.ct_select_vec(c, a, b)
    np.testing.assert_array_equal(got, np.where(c == 1, a, b))


def test_timing_guard():
    import time
    t0 = time.perf_counter_ns()
    with security.TimingGuard(min_ns=30_000_000) as g:
        pass                                     # instant body
    assert time.perf_counter_ns() - t0 >= 30_000_000
    assert g.elapsed_ns >= 30_000_000


def test_noise_flooding_decrypt(rng):
    N = 256
    ctx = ckks.CkksContext.create(N=N, num_levels=4, scale_bits=28, dnum=2)
    sk, pk = ctx.keygen(rng)
    z = rng.normal(size=N // 2)
    ct = ctx.encrypt(pk, z, rng)
    plain = ctx.decrypt(sk, ct).real
    flooded = ctx.decrypt(sk, ct, flood_rng=np.random.default_rng(1)).real
    # still decodes the message (2^20 flood at 2^28 scale ~ 0.1 error)...
    np.testing.assert_allclose(flooded, z, atol=0.5)
    # ...but the decryption noise is no longer the deterministic one
    assert np.abs(flooded - plain).max() > 1e-4