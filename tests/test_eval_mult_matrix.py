"""EvalMult depth/strategy battery (the reference's UnitTestEvalMult*
suites, SURVEY §4: utckksrns/UnitTestEvalMult, utbfvrns, utbgvrns):
product chains of increasing depth, relinearize-now vs relinearize-at-
the-end, square chains, and plaintext-operand interleaving -- swept over
CKKS/BGV/BFV with module-scoped contexts (one keygen per scheme).
"""

import numpy as np
import pytest

from fhe_tpu.pke import ckks, bgv, bfv, advanced


# ---------------------------------------------------------------------------
# CKKS
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ckks_env():
    ctx = ckks.CkksContext.create(N=256, num_levels=7, scale_bits=26, dnum=2)
    rng = np.random.default_rng(41)
    sk, pk = ctx.keygen(rng)
    evk = ctx.relin_key_gen(sk, rng)
    return ctx, sk, pk, evk, rng


@pytest.mark.parametrize("depth", [2, 3, 4, 5])
def test_ckks_product_chain(ckks_env, depth):
    """x^depth via sequential mul_aligned + rescale at every level."""
    ctx, sk, pk, evk, rng = ckks_env
    z = rng.normal(size=128) * 0.6
    ct = ctx.encrypt(pk, z, rng)
    acc = ct
    for _ in range(depth - 1):
        acc = advanced.mul_aligned(ctx, acc, ct, evk)
    got = ctx.decrypt(sk, acc).real
    np.testing.assert_allclose(got, z ** depth, atol=5e-3 * depth)


@pytest.mark.parametrize("depth", [2, 3])
def test_ckks_square_chain(ckks_env, depth):
    """x^(2^depth) via repeated squaring."""
    ctx, sk, pk, evk, rng = ckks_env
    z = rng.uniform(0.3, 0.9, size=128)
    ct = ctx.encrypt(pk, z, rng)
    acc = ct
    for _ in range(depth):
        acc = ctx.rescale(ctx.square(acc, evk))
    got = ctx.decrypt(sk, acc).real
    np.testing.assert_allclose(got, z ** (2 ** depth), atol=1e-2)


def test_ckks_relin_at_end_matches_relin_now(ckks_env):
    """(a*b)*relin == relin(a*b): deferred relinearization decrypts to
    the same values (reference keeps degree-3 ciphertexts around)."""
    ctx, sk, pk, evk, rng = ckks_env
    z1 = rng.normal(size=128) * 0.5
    z2 = rng.normal(size=128) * 0.5
    c1 = ctx.encrypt(pk, z1, rng)
    c2 = ctx.encrypt(pk, z2, rng)
    now = ctx.rescale(ctx.mul(c1, c2, evk))
    deferred = ctx.rescale(ctx.relinearize(ctx.mul_no_relin(c1, c2), evk))
    g_now = ctx.decrypt(sk, now).real
    g_def = ctx.decrypt(sk, deferred).real
    np.testing.assert_allclose(g_now, z1 * z2, atol=2e-3)
    np.testing.assert_allclose(g_def, z1 * z2, atol=2e-3)


def test_ckks_plain_interleave(ckks_env):
    """(x * p1 + p2) * x with plaintext operands between ct mults."""
    ctx, sk, pk, evk, rng = ckks_env
    z = rng.normal(size=128) * 0.5
    p1 = rng.normal(size=128)
    p2 = rng.normal(size=128)
    ct = ctx.encrypt(pk, z, rng)
    t1 = ctx.rescale(ctx.mul_plain(ct, p1))
    t2 = ctx.add_plain(t1, p2)
    out = advanced.mul_aligned(ctx, t2, ct, evk)
    got = ctx.decrypt(sk, out).real
    np.testing.assert_allclose(got, (z * p1 + p2) * z, atol=5e-3)


def test_ckks_mult_many(ckks_env):
    """eval_mult_many over 4 fresh ciphertexts (balanced tree)."""
    ctx, sk, pk, evk, rng = ckks_env
    zs = [rng.uniform(0.4, 0.9, size=128) for _ in range(4)]
    cts = [ctx.encrypt(pk, z, rng) for z in zs]
    out = advanced.eval_mult_many(ctx, cts, evk)
    got = ctx.decrypt(sk, out).real
    want = zs[0] * zs[1] * zs[2] * zs[3]
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_ckks_add_many(ckks_env):
    ctx, sk, pk, evk, rng = ckks_env
    zs = [rng.normal(size=128) for _ in range(5)]
    cts = [ctx.encrypt(pk, z, rng) for z in zs]
    out = advanced.eval_add_many(ctx, cts)
    got = ctx.decrypt(sk, out).real
    np.testing.assert_allclose(got, np.sum(zs, axis=0), atol=5e-3)


# ---------------------------------------------------------------------------
# BGV
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def bgv_env():
    ctx = bgv.BgvContext.create(N=128, num_levels=4, plain_mod=65537,
                                mod_bits=28)
    rng = np.random.default_rng(43)
    sk, pk = ctx.keygen(rng)
    evk = ctx.relin_key_gen(sk, rng)
    return ctx, sk, pk, evk, rng


@pytest.mark.parametrize("depth", [2, 3])
def test_bgv_product_chain(bgv_env, depth):
    ctx, sk, pk, evk, rng = bgv_env
    t = ctx.t
    m = rng.integers(0, t, size=ctx.params.N)
    ct = ctx.encrypt(pk, m, rng)
    acc = ct
    want = m.astype(object)
    for _ in range(depth - 1):
        acc = ctx.mod_reduce(ctx.mul(acc, ct, evk))
        want = want * m % t
    got = np.asarray(ctx.decrypt(sk, acc))
    np.testing.assert_array_equal(got, want.astype(np.int64))


def test_bgv_square_vs_mul(bgv_env):
    ctx, sk, pk, evk, rng = bgv_env
    t = ctx.t
    m = rng.integers(0, t, size=ctx.params.N)
    ct = ctx.encrypt(pk, m, rng)
    sq = ctx.mod_reduce(ctx.square(ct, evk))
    mm = ctx.mod_reduce(ctx.mul(ct, ct, evk))
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk, sq)),
                                  np.asarray(ctx.decrypt(sk, mm)))


def test_bgv_plain_interleave(bgv_env):
    ctx, sk, pk, evk, rng = bgv_env
    t = ctx.t
    m = rng.integers(0, t, size=ctx.params.N)
    p = rng.integers(0, t, size=ctx.params.N)
    ct = ctx.encrypt(pk, m, rng)
    out = ctx.mod_reduce(ctx.mul(ctx.add_plain(ctx.mul_plain(ct, p), p),
                                 ct, evk))
    want = ((m.astype(object) * p + p) * m) % t
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk, out)),
                                  want.astype(np.int64))


# ---------------------------------------------------------------------------
# BFV (both multiplication techniques through the depth chain)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def bfv_env():
    ctx = bfv.BfvContext.create(N=128, num_limbs=4, plain_mod=65537,
                                mod_bits=28, dnum=2)
    rng = np.random.default_rng(47)
    sk, pk = ctx.keygen(rng)
    evk = ctx.relin_key_gen(sk, rng)
    return ctx, sk, pk, evk, rng


@pytest.mark.parametrize("tech", ["hps", "behz"])
@pytest.mark.parametrize("depth", [2, 3])
def test_bfv_product_chain(bfv_env, tech, depth):
    ctx, sk, pk, evk, rng = bfv_env
    t = ctx.t
    m = rng.integers(0, 50, size=ctx.params.N)
    ct = ctx.encrypt(pk, m, rng)
    acc = ct
    want = m.astype(object)
    for _ in range(depth - 1):
        acc = ctx.mul(acc, ct, evk, technique=tech)
        want = want * m % t
    got = np.asarray(ctx.decrypt(sk, acc))
    np.testing.assert_array_equal(got, want.astype(np.int64))


def test_bfv_hps_behz_agree(bfv_env):
    """Both multiplicationTechniques decrypt to the same plaintext
    (compare-bfv-hps-leveled-vs-behz.cpp as a correctness check)."""
    ctx, sk, pk, evk, rng = bfv_env
    t = ctx.t
    m1 = rng.integers(0, t, size=ctx.params.N)
    m2 = rng.integers(0, t, size=ctx.params.N)
    c1, c2 = ctx.encrypt(pk, m1, rng), ctx.encrypt(pk, m2, rng)
    hps = np.asarray(ctx.decrypt(sk, ctx.mul(c1, c2, evk, technique="hps")))
    behz = np.asarray(ctx.decrypt(sk, ctx.mul(c1, c2, evk, technique="behz")))
    want = (m1.astype(object) * m2 % t).astype(np.int64)
    np.testing.assert_array_equal(hps, want)
    np.testing.assert_array_equal(behz, want)


def test_bfv_plain_interleave(bfv_env):
    ctx, sk, pk, evk, rng = bfv_env
    t = ctx.t
    m = rng.integers(0, t, size=ctx.params.N)
    p = rng.integers(0, t, size=ctx.params.N)
    ct = ctx.encrypt(pk, m, rng)
    out = ctx.mul(ctx.add_plain(ctx.mul_plain(ct, p), p), ct, evk)
    want = ((m.astype(object) * p + p) * m % t).astype(np.int64)
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk, out)), want)


def test_bgv_mixed_level_add(bgv_env):
    """add with operands at different levels/scale factors: the deeper
    operand is auto-ModReduced and scale-matched (LeveledSHERNS EvalAdd)."""
    ctx, sk, pk, evk, rng = bgv_env
    t = ctx.t
    m1 = rng.integers(0, t, size=ctx.params.N)
    m2 = rng.integers(0, t, size=ctx.params.N)
    c1 = ctx.encrypt(pk, m1, rng)
    c2 = ctx.encrypt(pk, m2, rng)
    deep = ctx.mod_reduce(ctx.mul(c1, c2, evk))     # level down, scale != 1
    fresh = ctx.encrypt(pk, m2, rng)                # full basis, scale 1
    out = ctx.add(deep, fresh)
    want = (m1.astype(object) * m2 + m2) % t
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk, out)),
                                  want.astype(np.int64))
    out2 = ctx.add(fresh, deep)
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk, out2)),
                                  want.astype(np.int64))
