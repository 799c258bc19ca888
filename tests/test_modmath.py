"""Bit-exact tests of the uint32 modular arithmetic core against Python ints.

Mirrors the role of the reference's UnitTestBinInt/UnitTestMubintvec suites
(src/core/unittest/) -- exhaustive randomized known-answer checks.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fhe_tpu.math import modmath as mm
from fhe_tpu.math import primes

Q27 = primes.last_prime(27, 2048)   # the STD128 ring modulus
MODS = [Q27, primes.last_prime(28, 4096), 12289, 786433, (1 << 31) - 1]


def rnd_u32(rng, n, hi=1 << 32):
    return rng.integers(0, hi, size=n, dtype=np.uint64).astype(np.uint32)


def test_mul32_parts(rng):
    a = rnd_u32(rng, 4096)
    b = rnd_u32(rng, 4096)
    hi, lo = mm.mul32_parts(jnp.asarray(a), jnp.asarray(b))
    prod = a.astype(np.uint64) * b.astype(np.uint64)
    np.testing.assert_array_equal(np.asarray(hi), (prod >> 32).astype(np.uint32))
    np.testing.assert_array_equal(np.asarray(lo), (prod & 0xFFFFFFFF).astype(np.uint32))


@pytest.mark.parametrize("q", MODS)
def test_add_sub_neg(rng, q):
    a = rnd_u32(rng, 2048, q)
    b = rnd_u32(rng, 2048, q)
    np.testing.assert_array_equal(
        np.asarray(mm.add_mod(jnp.asarray(a), jnp.asarray(b), q)),
        ((a.astype(np.uint64) + b) % q).astype(np.uint32))
    np.testing.assert_array_equal(
        np.asarray(mm.sub_mod(jnp.asarray(a), jnp.asarray(b), q)),
        ((a.astype(np.int64) - b + q) % q).astype(np.uint32))
    np.testing.assert_array_equal(
        np.asarray(mm.neg_mod(jnp.asarray(a), q)),
        ((q - a.astype(np.int64)) % q).astype(np.uint32))


@pytest.mark.parametrize("q", [m for m in MODS if m % 2 == 1])
def test_mont_mul(rng, q):
    qinv_neg, r1, r2 = mm.mont_constants(q)
    a = rnd_u32(rng, 2048, q)
    b = rnd_u32(rng, 2048, q)
    b_mont = (b.astype(np.uint64) << 32) % q
    got = mm.mont_mul(jnp.asarray(a), jnp.asarray(b_mont.astype(np.uint32)),
                      q, jnp.uint32(qinv_neg))
    want = (a.astype(np.uint64) * b) % q
    np.testing.assert_array_equal(np.asarray(got), want.astype(np.uint32))
    # to_mont/from_mont roundtrip
    am = mm.to_mont(jnp.asarray(a), q, jnp.uint32(qinv_neg), jnp.uint32(r2))
    back = mm.from_mont(am, q, jnp.uint32(qinv_neg))
    np.testing.assert_array_equal(np.asarray(back), a)


@pytest.mark.parametrize("q", MODS)
def test_shoup_mul(rng, q):
    ws = rnd_u32(rng, 64, q)
    a = rnd_u32(rng, 64)  # any uint32
    for w in ws[:8]:
        wp = mm.shoup_precompute(int(w), q)
        got = mm.shoup_mul(jnp.asarray(a), jnp.uint32(w), jnp.uint32(wp), q)
        want = (a.astype(np.uint64) * int(w)) % q
        np.testing.assert_array_equal(np.asarray(got), want.astype(np.uint32))


@pytest.mark.parametrize("q", MODS)
def test_reduce_i32(rng, q):
    if q >= 1 << 30:
        pytest.skip("reduce_i32 requires q < 2^30")
    x = rng.integers(-(1 << 30), 1 << 30, size=4096, dtype=np.int64)
    got = mm.reduce_i32(jnp.asarray(x.astype(np.int32)), q)
    np.testing.assert_array_equal(np.asarray(got), (x % q).astype(np.uint32))


def test_divmod_u64(rng):
    for d in [1024, 16384, Q27, 2 * Q27]:
        v = rng.integers(0, min(np.uint64(d) * (1 << 25), 1 << 62), size=1024,
                         dtype=np.uint64)
        hi = (v >> 32).astype(np.uint32)
        lo = (v & 0xFFFFFFFF).astype(np.uint32)
        k, r = mm.divmod_u64_u32(jnp.asarray(hi), jnp.asarray(lo), d)
        np.testing.assert_array_equal(np.asarray(k), (v // d).astype(np.uint32))
        np.testing.assert_array_equal(np.asarray(r), (v % d).astype(np.uint32))


def test_round_scale_mod(rng):
    # RoundqQ semantics: floor(0.5 + v*q/Q) mod q (lwe-pke.cpp:41)
    Q, q = Q27, 1024
    v = rng.integers(0, Q, size=4096, dtype=np.uint64)
    got = mm.round_scale_mod(jnp.asarray(v.astype(np.uint32)), q, Q, q)
    want = np.floor(0.5 + v.astype(np.float64) * q / Q).astype(np.uint64) % q
    np.testing.assert_array_equal(np.asarray(got), want.astype(np.uint32))


def test_primes():
    assert primes.last_prime(27, 2048) == 134215681
    q = primes.last_prime(28, 4096)
    assert primes.is_prime(q) and q % 4096 == 1 and q < 1 << 28
    w = primes.root_of_unity(2048, Q27)
    assert pow(w, 2048, Q27) == 1 and pow(w, 1024, Q27) == Q27 - 1
    ps = primes.generate_ntt_primes(28, 1 << 15, 8)
    assert len(set(ps)) == 8
    for p in ps:
        assert primes.is_prime(p) and p % (1 << 15) == 1
