"""Parameterized scheme matrix (the reference's CSV-driven context
testing, SURVEY §4: unittest/utils/UnitTestCCParams + per-scheme CSV
rows): one op battery -- encrypt/decrypt roundtrip, add, multiply (+
relinearize + rescale/ModReduce), rotation -- swept over a grid of
(scheme, ring dimension, chain length) contexts."""

import numpy as np
import pytest

from fhe_tpu.pke import ckks, bgv, bfv


CKKS_GRID = [
    dict(N=1 << 7, num_levels=4, scale_bits=26, dnum=2),
    dict(N=1 << 8, num_levels=6, scale_bits=26, dnum=3),
    dict(N=1 << 9, num_levels=4, scale_bits=28, dnum=2),
    dict(N=1 << 8, num_levels=8, scale_bits=52, dnum=2,
         composite_degree=2),
    # dnum = 1 (single digit, max P) and dnum = levels (per-limb digits)
    dict(N=1 << 8, num_levels=4, scale_bits=26, dnum=1),
    dict(N=1 << 8, num_levels=4, scale_bits=26, dnum=4),
    # composite scaling at degree 3 (3 sub-limbs per level)
    dict(N=1 << 8, num_levels=6, scale_bits=54, dnum=2,
         composite_degree=3),
    # BV key switching instead of HYBRID, two relinWindow choices.
    # BV noise is additive ~2^digit_bits * e * sqrt(rows*N) with NO
    # rescale after a rotation, so the rotation error floor is
    # ~2^(digit_bits-scale_bits): keep windows small at scale 28
    # (digit_bits=0 per-tower digits are only usable when a rescale
    # follows, as in relinearization -- the mul assert still covers it).
    dict(N=1 << 8, num_levels=4, scale_bits=28, dnum=2, ks="bv",
         digit_bits=4),
    dict(N=1 << 8, num_levels=4, scale_bits=28, dnum=2, ks="bv",
         digit_bits=7),
]


@pytest.mark.parametrize("cfg", CKKS_GRID,
                         ids=lambda c: f"N{c['N']}_L{c['num_levels']}"
                         f"_s{c['scale_bits']}_cd{c.get('composite_degree', 1)}"
                         + (f"_{c['ks']}{c.get('digit_bits', '')}"
                            if "ks" in c else ""))
def test_ckks_matrix(cfg):
    cfg = dict(cfg)
    ks = cfg.pop("ks", "hybrid")
    digit_bits = cfg.pop("digit_bits", 0)
    ctx = ckks.CkksContext.create(**cfg)
    rng = np.random.default_rng(17)
    sk, pk = ctx.keygen(rng)
    evk = ctx.relin_key_gen(sk, rng, method=ks, digit_bits=digit_bits)
    rot = ctx.rotation_key_gen(sk, [1], rng, method=ks,
                               digit_bits=digit_bits)
    n = ctx.params.N // 2
    z1 = rng.normal(size=n) * 0.5
    z2 = rng.normal(size=n) * 0.5
    c1 = ctx.encrypt(pk, z1, rng)
    c2 = ctx.encrypt(pk, z2, rng)
    tol = 1e-3 if cfg.get("composite_degree", 1) == 1 else 1e-6
    assert np.abs(ctx.decrypt(sk, c1).real - z1).max() < tol
    assert np.abs(ctx.decrypt(sk, ctx.add(c1, c2)).real
                  - (z1 + z2)).max() < 2 * tol
    prod = ctx.rescale(ctx.mul(c1, c2, evk))
    assert np.abs(ctx.decrypt(sk, prod).real - z1 * z2).max() < 4e-3
    rotated = ctx.rotate(c1, 1, rot)
    assert np.abs(ctx.decrypt(sk, rotated).real
                  - np.roll(z1, -1)).max() < 4e-3


BGV_GRID = [
    dict(N=1 << 7, num_levels=3, plain_mod=65537, mod_bits=28),
    dict(N=1 << 8, num_levels=4, plain_mod=65537, mod_bits=28),
    # packed encoding needs t = 1 mod 2N: 257 = 1 mod 256 works at N=128
    dict(N=1 << 7, num_levels=3, plain_mod=257, mod_bits=28),
    # 12289 = 1 mod 4096: NTT-friendly t at both N (lattice-crypto prime)
    dict(N=1 << 7, num_levels=3, plain_mod=12289, mod_bits=28),
    dict(N=1 << 9, num_levels=5, plain_mod=12289, mod_bits=30),
]


@pytest.mark.parametrize("cfg", BGV_GRID,
                         ids=lambda c: f"N{c['N']}_L{c['num_levels']}"
                         f"_t{c['plain_mod']}")
def test_bgv_matrix(cfg):
    ctx = bgv.BgvContext.create(**cfg)
    rng = np.random.default_rng(23)
    sk, pk = ctx.keygen(rng)
    evk = ctx.relin_key_gen(sk, rng)
    t = cfg["plain_mod"]
    n = ctx.params.N
    m1 = rng.integers(0, t, size=n)
    m2 = rng.integers(0, t, size=n)
    c1 = ctx.encrypt(pk, m1, rng)
    c2 = ctx.encrypt(pk, m2, rng)
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk, c1)), m1)
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk, ctx.add(c1, c2))),
                                  (m1 + m2) % t)
    prod = ctx.mod_reduce(ctx.mul(c1, c2, evk))
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk, prod)),
                                  (m1 * m2) % t)


BFV_GRID = [
    dict(N=1 << 7, num_limbs=3, plain_mod=65537, mod_bits=28),
    dict(N=1 << 8, num_limbs=4, plain_mod=65537, mod_bits=28),
    dict(N=1 << 7, num_limbs=3, plain_mod=257, mod_bits=28),
    dict(N=1 << 8, num_limbs=5, plain_mod=12289, mod_bits=30, dnum=3),
    dict(N=1 << 9, num_limbs=4, plain_mod=65537, mod_bits=28, dnum=2),
]


@pytest.mark.parametrize("cfg", BFV_GRID,
                         ids=lambda c: f"N{c['N']}_k{c['num_limbs']}")
def test_bfv_matrix(cfg):
    ctx = bfv.BfvContext.create(**cfg)
    rng = np.random.default_rng(29)
    sk, pk = ctx.keygen(rng)
    evk = ctx.relin_key_gen(sk, rng)
    t = cfg["plain_mod"]
    n = ctx.params.N
    m1 = rng.integers(0, 100, size=n)
    m2 = rng.integers(0, 100, size=n)
    c1 = ctx.encrypt(pk, m1, rng)
    c2 = ctx.encrypt(pk, m2, rng)
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk, c1)), m1)
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk, ctx.add(c1, c2))),
                                  (m1 + m2) % t)
    prod = ctx.mul(c1, c2, evk)
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk, prod)),
                                  (m1 * m2) % t)
