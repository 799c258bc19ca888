"""PRE tests (UnitTestPRE / UnitTestMultihopPRE analogue): single-hop and
2-hop re-encryption for CKKS and BGV, with HRA rerandomization."""

import numpy as np
import pytest

from fhe_tpu.pke import ckks, bgv, pre, rlwe

N = 256


def test_ckks_pre_single_hop(rng):
    ctx = ckks.CkksContext.create(N=N, num_levels=3, scale_bits=26, dnum=2)
    sk_a, pk_a = ctx.keygen(rng)
    sk_b, pk_b = ctx.keygen(rng)
    rk = pre.re_key_gen(ctx.params, sk_a, sk_b, rng)
    z = rng.normal(size=N // 2)
    ct = ctx.encrypt(pk_a, z, rng)
    c0, c1 = pre.re_encrypt(ctx.params, rk, ct.c0, ct.c1, rng, pk_b)
    ct_b = ckks.Ciphertext(c0, c1, ct.scale)
    got = ctx.decrypt(sk_b, ct_b)
    np.testing.assert_allclose(got.real, z, atol=1e-2)
    # Alice's key must NOT decrypt the re-encrypted ct
    bad = ctx.decrypt(sk_a, ct_b)
    assert np.abs(bad.real - z).max() > 0.1


def test_ckks_pre_multihop(rng):
    ctx = ckks.CkksContext.create(N=N, num_levels=3, scale_bits=26, dnum=2)
    keys = [ctx.keygen(rng) for _ in range(3)]
    rk_ab = pre.re_key_gen(ctx.params, keys[0][0], keys[1][0], rng)
    rk_bc = pre.re_key_gen(ctx.params, keys[1][0], keys[2][0], rng)
    z = rng.normal(size=N // 2)
    ct = ctx.encrypt(keys[0][1], z, rng)
    c0, c1 = pre.re_encrypt(ctx.params, rk_ab, ct.c0, ct.c1)
    c0, c1 = pre.re_encrypt(ctx.params, rk_bc, c0, c1)
    got = ctx.decrypt(keys[2][0], ckks.Ciphertext(c0, c1, ct.scale))
    np.testing.assert_allclose(got.real, z, atol=2e-2)


def test_bgv_pre(rng):
    ctx = bgv.BgvContext.create(N=N, num_levels=2, plain_mod=65537,
                                mod_bits=28, dnum=2)
    sk_a, pk_a = ctx.keygen(rng)
    sk_b, pk_b = ctx.keygen(rng)
    rk = pre.re_key_gen(ctx.params, sk_a, sk_b, rng)
    m = rng.integers(0, 65537, size=N)
    ct = ctx.encrypt(pk_a, m, rng)
    c0, c1 = pre.re_encrypt(ctx.params, rk, ct.c0, ct.c1, rng, pk_b)
    got = ctx.decrypt(sk_b, bgv.Ciphertext(c0, c1))
    np.testing.assert_array_equal(got, m % 65537)
