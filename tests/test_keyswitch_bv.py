"""BV (digit-decomposition) key switching tests
(keyswitch-bv.cpp:48-336 analogue): switching identity, relinearized
CKKS multiply, rotations, and PRE under method='bv', across relinWindow
(digit_bits) settings including the per-tower-only window 0."""

import numpy as np
import pytest
import jax.numpy as jnp

from fhe_tpu.lattice import rns
from fhe_tpu.pke import ckks, pre, rlwe, params as pkeparams

N = 256


def _phase_error(params, d0, d1, c, s_old_poly, sk_new):
    """max |(d0 + d1*s_new) - c*s_old| over CRT-reconstructed coeffs."""
    s_new = sk_new.eval_poly(tuple(c.moduli))
    lhs = rns.add(d0, rns.mul(d1, s_new))
    rhs = rns.mul(c, s_old_poly)
    diff = rns.to_coeff(rns.sub(lhs, rhs))
    big = rns.to_bigint(diff)
    Q = 1
    for q in c.moduli:
        Q *= q
    centered = np.array([int(x) - Q if int(x) > Q // 2 else int(x)
                         for x in big.ravel()], dtype=object)
    return max(abs(int(v)) for v in centered), Q


@pytest.mark.parametrize("digit_bits", [0, 5, 12])
def test_bv_switch_identity(rng, digit_bits):
    """d0 + d1*s_new = c*s_old + e with e small relative to Q."""
    p = pkeparams.make_ckks_params(N=N, num_levels=5, scale_bits=28, dnum=2)
    sk = rlwe.keygen(p, rng)
    s = sk.eval_poly(tuple(p.moduli))
    s2 = rns.mul(s, s)
    evk = rlwe.bv_evk_gen(p, s2, sk, rng, digit_bits=digit_bits)
    data = np.stack([rng.integers(0, q, size=N, dtype=np.int64)
                     for q in p.moduli]).astype(np.uint32)
    c = rns.RnsPoly(jnp.asarray(data), tuple(p.moduli), rns.EVAL)
    d0, d1 = rlwe.key_switch(p, evk, c)
    err, Q = _phase_error(p, d0, d1, c, s2, sk)
    # noise ~ sum of n_rows digit*e terms; per-tower digits are O(q_i)
    bound = (1 << 30) * (1 << (digit_bits or 28))
    assert err < bound, (err, bound)
    assert err < Q >> 20


@pytest.mark.parametrize("digit_bits", [6, 12])
def test_bv_relin_mult_decrypts(rng, digit_bits):
    ctx = ckks.CkksContext.create(N=N, num_levels=4, scale_bits=28, dnum=2)
    sk, pk = ctx.keygen(rng)
    rlk = ctx.relin_key_gen(sk, rng, method="bv", digit_bits=digit_bits)
    assert isinstance(rlk, rlwe.BvEvalKey)
    z1 = rng.normal(size=N // 2) * 0.5
    z2 = rng.normal(size=N // 2) * 0.5
    ct1 = ctx.encrypt(pk, z1, rng)
    ct2 = ctx.encrypt(pk, z2, rng)
    got = ctx.decrypt(sk, ctx.rescale(ctx.mul(ct1, ct2, rlk)))
    np.testing.assert_allclose(got.real, z1 * z2, atol=0.05)


def test_bv_rotation_decrypts(rng):
    ctx = ckks.CkksContext.create(N=N, num_levels=4, scale_bits=28, dnum=2)
    sk, pk = ctx.keygen(rng)
    rot = ctx.rotation_key_gen(sk, [1], rng, method="bv", digit_bits=8)
    z = rng.normal(size=N // 2)
    ct = ctx.encrypt(pk, z, rng)
    got = ctx.decrypt(sk, ctx.rotate(ct, 1, rot))
    np.testing.assert_allclose(got.real, np.roll(z, -1), atol=0.02)


def test_bv_switch_truncated_basis(rng):
    """BV switch on a level-reduced ciphertext (DropLastElements path)."""
    p = pkeparams.make_ckks_params(N=N, num_levels=5, scale_bits=28, dnum=2)
    sk = rlwe.keygen(p, rng)
    s = sk.eval_poly(tuple(p.moduli))
    s2 = rns.mul(s, s)
    evk = rlwe.bv_evk_gen(p, s2, sk, rng, digit_bits=8)
    mods_l = tuple(p.moduli[:3])
    data = np.stack([rng.integers(0, q, size=N, dtype=np.int64)
                     for q in mods_l]).astype(np.uint32)
    c = rns.RnsPoly(jnp.asarray(data), mods_l, rns.EVAL)
    d0, d1 = rlwe.key_switch(p, evk, c)
    s2_l = rns.RnsPoly(s2.data[:3], mods_l, rns.EVAL)
    err, Q = _phase_error(p, d0, d1, c, s2_l, sk)
    assert err < Q >> 20


@pytest.mark.parametrize("method", ["hybrid", "bv"])
def test_pre_under_both_methods(rng, method):
    """Proxy re-encryption round trip under both key-switch families
    (UnitTestPRE pattern)."""
    ctx = ckks.CkksContext.create(N=N, num_levels=3, scale_bits=28, dnum=2)
    sk_a, pk_a = ctx.keygen(rng)
    sk_b, pk_b = ctx.keygen(rng)
    rk = pre.re_key_gen(ctx.params, sk_a, sk_b, rng, method=method,
                        digit_bits=8)
    z = rng.normal(size=N // 2)
    ct = ctx.encrypt(pk_a, z, rng)
    c0, c1 = pre.re_encrypt(ctx.params, rk, ct.c0, ct.c1, rng, pk_b)
    ct_b = ckks.Ciphertext(c0, c1, ct.scale)
    got = ctx.decrypt(sk_b, ct_b)
    np.testing.assert_allclose(got.real, z, atol=0.02)
