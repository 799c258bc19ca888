"""BGV tests: packed encode/decode, enc/dec, exact SIMD ops, mod reduce,
relinearized multiplication depth (utbgvrns analogue)."""

import numpy as np
import pytest

from fhe_tpu.pke import bgv

N = 256
T = 65537


@pytest.fixture(scope="module")
def ctx():
    return bgv.BgvContext.create(N=N, num_levels=3, plain_mod=T,
                                 mod_bits=28, dnum=2)


@pytest.fixture(scope="module")
def keys(ctx):
    rng = np.random.default_rng(5)
    sk, pk = ctx.keygen(rng)
    evk = ctx.relin_key_gen(sk, rng)
    return sk, pk, evk, rng


def test_encode_decode(rng):
    m = rng.integers(0, T, size=N)
    np.testing.assert_array_equal(bgv.decode(bgv.encode(m, T, N), T, N),
                                  m % T)


def test_encrypt_decrypt(ctx, keys, rng):
    sk, pk, _, _ = keys
    m = rng.integers(0, T, size=N)
    ct = ctx.encrypt(pk, m, rng)
    np.testing.assert_array_equal(ctx.decrypt(sk, ct), m % T)


def test_add_sub_plain(ctx, keys, rng):
    sk, pk, _, _ = keys
    m1 = rng.integers(0, T, size=N)
    m2 = rng.integers(0, T, size=N)
    ct1 = ctx.encrypt(pk, m1, rng)
    ct2 = ctx.encrypt(pk, m2, rng)
    np.testing.assert_array_equal(ctx.decrypt(sk, ctx.add(ct1, ct2)),
                                  (m1 + m2) % T)
    np.testing.assert_array_equal(ctx.decrypt(sk, ctx.sub(ct1, ct2)),
                                  (m1 - m2) % T)
    np.testing.assert_array_equal(ctx.decrypt(sk, ctx.add_plain(ct1, m2)),
                                  (m1 + m2) % T)
    np.testing.assert_array_equal(ctx.decrypt(sk, ctx.mul_plain(ct1, m2)),
                                  (m1 * m2) % T)


def test_mul_relin(ctx, keys, rng):
    sk, pk, evk, _ = keys
    m1 = rng.integers(0, T, size=N)
    m2 = rng.integers(0, T, size=N)
    ct1 = ctx.encrypt(pk, m1, rng)
    ct2 = ctx.encrypt(pk, m2, rng)
    prod = ctx.mul(ct1, ct2, evk)
    assert prod.c2 is None
    np.testing.assert_array_equal(ctx.decrypt(sk, prod), (m1 * m2) % T)
    # without relin the degree-2 ct still decrypts
    prod2 = ctx.mul(ct1, ct2)
    np.testing.assert_array_equal(ctx.decrypt(sk, prod2), (m1 * m2) % T)


def test_mod_reduce(ctx, keys, rng):
    sk, pk, evk, _ = keys
    m1 = rng.integers(0, T, size=N)
    m2 = rng.integers(0, T, size=N)
    ct1 = ctx.encrypt(pk, m1, rng)
    ct2 = ctx.encrypt(pk, m2, rng)
    prod = ctx.mul(ct1, ct2, evk)
    red = ctx.mod_reduce(prod)
    assert len(red.moduli) == len(prod.moduli) - 1
    np.testing.assert_array_equal(ctx.decrypt(sk, red), (m1 * m2) % T)


def test_mul_depth2(ctx, keys, rng):
    sk, pk, evk, _ = keys
    m = rng.integers(0, T, size=N)
    ct = ctx.encrypt(pk, m, rng)
    sq = ctx.mod_reduce(ctx.mul(ct, ct, evk))
    sq2 = ctx.mod_reduce(ctx.mul(sq, sq, evk))
    np.testing.assert_array_equal(ctx.decrypt(sk, sq2),
                                  (pow(1, 1) * m.astype(object) ** 4) % T)


def test_rotation(ctx, keys, rng):
    sk, pk, _, _ = keys
    rot_keys = ctx.rotation_key_gen(sk, [1], rng)
    m = rng.integers(0, T, size=N)
    ct = ctx.encrypt(pk, m, rng)
    got = ctx.decrypt(sk, ctx.rotate(ct, 1, rot_keys))
    # mod-t NTT slot layout: rotation by 5^1 permutes slots by the same
    # automorphism acting on the plaintext NTT points
    want = bgv.decode(_automorph_coeffs(bgv.encode(m, T, N), 5), T, N)
    np.testing.assert_array_equal(got, want)


def _automorph_coeffs(coeffs, k):
    N_ = len(coeffs)
    out = np.zeros(N_, dtype=np.int64)
    for i in range(N_):
        e = (i * k) % (2 * N_)
        sgn = 1 if e < N_ else -1
        out[e % N_] = (out[e % N_] + sgn * coeffs[i]) % T
    return out
