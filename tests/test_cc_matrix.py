"""CSV-style CryptoContext parameter matrix (the reference's
UnitTestCCParams / BaseTestCase pattern, SURVEY §4: shared fixtures drive
one op battery over a grid of parameterized contexts read from CSV rows
-- src/pke/unittest/utils/UnitTestCCParams.{h,cpp}, per-scheme
ut{bfv,bgv,ckks}rns CSV data).

Here each ROW is one context configuration (scheme x ring x chain x
key-switch family x scaling mode x secret distribution) and each CASE is
one operation check; pytest parametrizes the cross product, and contexts
+ keys are built once per row (module-level cache), matching the
reference's per-fixture context reuse.

Every LWE paramset additionally gets an encrypt/decrypt + mod-switch
row (UnitTestFHEW's per-set coverage at the LWE layer, no bootstrap)."""

import functools

import numpy as np
import pytest

from fhe_tpu.pke import ckks, bgv, bfv
from fhe_tpu.tfhe import params as tp, lwe


# ---------------------------------------------------------------------------
# rows: (scheme, kwargs, tags)
# ---------------------------------------------------------------------------

def _row(scheme, ident, **kw):
    return pytest.param((scheme, tuple(sorted(kw.items()))), id=ident)


CC_ROWS = [
    # CKKS: ring x chain sweep
    _row("ckks", "ckks_N128_L4_hyb", N=128, num_levels=4, scale_bits=26,
         dnum=2),
    _row("ckks", "ckks_N256_L6_hyb", N=256, num_levels=6, scale_bits=26,
         dnum=3),
    _row("ckks", "ckks_N512_L4_hyb", N=512, num_levels=4, scale_bits=28,
         dnum=2),
    # dnum extremes (single digit = max P; per-limb digits)
    _row("ckks", "ckks_N256_dnum1", N=256, num_levels=4, scale_bits=26,
         dnum=1),
    _row("ckks", "ckks_N256_dnum4", N=256, num_levels=4, scale_bits=26,
         dnum=4),
    # composite scaling (COMPOSITESCALINGAUTO analogue) at degree 2 and 3
    _row("ckks", "ckks_N256_cd2", N=256, num_levels=6, scale_bits=52,
         dnum=2, composite_degree=2),
    _row("ckks", "ckks_N256_cd3", N=256, num_levels=4, scale_bits=54,
         dnum=2, composite_degree=3),
    # BV key switching, two relinWindow choices
    _row("ckks", "ckks_N256_bv0", N=256, num_levels=4, scale_bits=28,
         dnum=2, ks="bv", digit_bits=0),
    _row("ckks", "ckks_N256_bv4", N=256, num_levels=4, scale_bits=28,
         dnum=2, ks="bv", digit_bits=4),
    _row("ckks", "ckks_N256_bv7", N=256, num_levels=4, scale_bits=28,
         dnum=2, ks="bv", digit_bits=7),
    # sparse ternary secret (SPARSE_TERNARY distribution)
    _row("ckks", "ckks_N256_sparse32", N=256, num_levels=4, scale_bits=26,
         dnum=2, h=32),
    # BGV: plaintext moduli sweep x key switch family
    _row("bgv", "bgv_N256_t65537", N=256, num_levels=4, plain_mod=65537,
         dnum=2),
    _row("bgv", "bgv_N256_t12289", N=256, num_levels=4, plain_mod=12289,
         dnum=2),
    _row("bgv", "bgv_N512_t65537", N=512, num_levels=3, plain_mod=65537,
         dnum=3),
    _row("bgv", "bgv_N256_bv", N=256, num_levels=4, plain_mod=65537,
         dnum=2, ks="bv", digit_bits=4),
    _row("bgv", "bgv_N256_L6", N=256, num_levels=6, plain_mod=65537,
         dnum=2),
    # BFV: mult technique x plaintext modulus
    _row("bfv", "bfv_N256_hps", N=256, num_limbs=3, plain_mod=65537,
         dnum=2, technique="hps"),
    _row("bfv", "bfv_N256_behz", N=256, num_limbs=3, plain_mod=65537,
         dnum=2, technique="behz"),
    _row("bfv", "bfv_N256_t12289", N=256, num_limbs=3, plain_mod=12289,
         dnum=2, technique="hps"),
    _row("bfv", "bfv_N512_hps", N=512, num_limbs=3, plain_mod=65537,
         dnum=3, technique="hps"),
    _row("bfv", "bfv_N256_bv", N=256, num_limbs=3, plain_mod=65537,
         dnum=2, ks="bv", digit_bits=4, technique="hps"),
]

CASES = ["enc_dec", "add_sub", "neg_scalar", "mul_relin", "mod_reduce",
         "rotate", "serialize"]


@functools.lru_cache(maxsize=None)
def _build(scheme: str, kw_items: tuple):
    kw = dict(kw_items)
    ks = kw.pop("ks", "hybrid")
    digit_bits = kw.pop("digit_bits", 0)
    h = kw.pop("h", None)
    technique = kw.pop("technique", "hps")
    rng = np.random.default_rng(42)
    if scheme == "ckks":
        ctx = ckks.CkksContext.create(**kw)
        sk, pk = (ctx.keygen(rng, h=h) if h else ctx.keygen(rng))
        evk = ctx.relin_key_gen(sk, rng, method=ks, digit_bits=digit_bits)
        rot = ctx.rotation_key_gen(sk, [1], rng, method=ks,
                                   digit_bits=digit_bits)
    elif scheme == "bgv":
        ctx = bgv.BgvContext.create(**kw)
        sk, pk = ctx.keygen(rng)
        evk = ctx.relin_key_gen(sk, rng, method=ks, digit_bits=digit_bits)
        rot = ctx.rotation_key_gen(sk, [1], rng, method=ks,
                                   digit_bits=digit_bits)
    else:
        ctx = bfv.BfvContext.create(**kw)
        sk, pk = ctx.keygen(rng)
        evk = ctx.relin_key_gen(sk, rng, method=ks, digit_bits=digit_bits)
        rot = ctx.rotation_key_gen(sk, [1], rng, method=ks,
                                   digit_bits=digit_bits)
    return ctx, sk, pk, evk, rot, technique


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("row", CC_ROWS)
def test_cc_matrix(row, case):
    scheme, kw_items = row
    ctx, sk, pk, evk, rot, technique = _build(scheme, kw_items)
    rng = np.random.default_rng(5)
    N = ctx.params.N
    if scheme == "ckks":
        _run_ckks(ctx, sk, pk, evk, rot, rng, case)
    elif scheme == "bgv":
        _run_bgv(ctx, sk, pk, evk, rot, rng, case)
    else:
        _run_bfv(ctx, sk, pk, evk, rot, rng, case, technique)


def _run_ckks(ctx, sk, pk, evk, rot, rng, case):
    n = ctx.params.N // 2
    z1 = rng.normal(size=n) * 0.5
    z2 = rng.normal(size=n) * 0.5
    c1 = ctx.encrypt(pk, z1, rng)
    tol = 2e-3
    if case == "enc_dec":
        assert np.abs(ctx.decrypt(sk, c1).real - z1).max() < tol
    elif case == "add_sub":
        c2 = ctx.encrypt(pk, z2, rng)
        assert np.abs(ctx.decrypt(sk, ctx.add(c1, c2)).real
                      - (z1 + z2)).max() < tol
        assert np.abs(ctx.decrypt(sk, ctx.sub(c1, c2)).real
                      - (z1 - z2)).max() < tol
    elif case == "neg_scalar":
        got = ctx.decrypt(sk, ctx.mul_plain(c1, np.full(n, 2.0))).real
        assert np.abs(got - 2 * z1).max() < 0.1
    elif case == "mul_relin":
        c2 = ctx.encrypt(pk, z2, rng)
        prod = ctx.mul(c1, c2, evk)
        assert prod.c2 is None
        assert np.abs(ctx.decrypt(sk, prod).real - z1 * z2).max() < 5e-3
    elif case == "mod_reduce":
        rs = ctx.rescale(ctx.mul(c1, c1, evk))
        assert rs.level_limbs < c1.level_limbs
        assert np.abs(ctx.decrypt(sk, rs).real - z1 * z1).max() < 5e-3
    elif case == "rotate":
        if getattr(evk, "digit_bits", None) == 0 and hasattr(evk, "rows_per_limb"):
            pytest.skip("BV relinWindow=0 rotation noise floor "
                        "~2^-(scale-digit) needs a following rescale "
                        "(see test_scheme_matrix notes)")
        out = ctx.rotate(c1, 1, rot)
        assert np.abs(ctx.decrypt(sk, out).real - np.roll(z1, -1)
                      ).max() < 0.05
    elif case == "serialize":
        from fhe_tpu.utils import serial
        back = serial.loads(serial.dumps(c1))
        np.testing.assert_array_equal(np.asarray(back.c0.data),
                                      np.asarray(c1.c0.data))


def _run_bgv(ctx, sk, pk, evk, rot, rng, case):
    N = ctx.params.N
    t = ctx.t
    m1 = rng.integers(0, min(t, 100), size=N)
    m2 = rng.integers(0, min(t, 100), size=N)
    c1 = ctx.encrypt(pk, m1, rng)
    if case == "enc_dec":
        np.testing.assert_array_equal(ctx.decrypt(sk, c1), m1 % t)
    elif case == "add_sub":
        c2 = ctx.encrypt(pk, m2, rng)
        np.testing.assert_array_equal(ctx.decrypt(sk, ctx.add(c1, c2)),
                                      (m1 + m2) % t)
        np.testing.assert_array_equal(ctx.decrypt(sk, ctx.sub(c1, c2)),
                                      (m1 - m2) % t)
    elif case == "neg_scalar":
        got = ctx.decrypt(sk, ctx.mul_plain(c1, np.full(N, 3)))
        np.testing.assert_array_equal(got, (3 * m1) % t)
    elif case == "mul_relin":
        c2 = ctx.encrypt(pk, m2, rng)
        got = ctx.decrypt(sk, ctx.mul(c1, c2, evk))
        np.testing.assert_array_equal(got, (m1 * m2) % t)
    elif case == "mod_reduce":
        out = ctx.mod_reduce(c1)
        assert len(out.moduli) == len(c1.moduli) - 1
        np.testing.assert_array_equal(ctx.decrypt(sk, out), m1 % t)
    elif case == "rotate":
        out = ctx.rotate(c1, 1, rot)
        want = _automorph_decode(bgv, m1, t, N)
        np.testing.assert_array_equal(ctx.decrypt(sk, out), want)
    elif case == "serialize":
        from fhe_tpu.utils import serial
        back = serial.loads(serial.dumps(c1))
        np.testing.assert_array_equal(np.asarray(back.c0.data),
                                      np.asarray(c1.c0.data))


def _run_bfv(ctx, sk, pk, evk, rot, rng, case, technique):
    N = ctx.params.N
    t = ctx.t
    m1 = rng.integers(0, min(t, 100), size=N)
    m2 = rng.integers(0, min(t, 100), size=N)
    c1 = ctx.encrypt(pk, m1, rng)
    if case == "enc_dec":
        np.testing.assert_array_equal(ctx.decrypt(sk, c1), m1 % t)
    elif case == "add_sub":
        c2 = ctx.encrypt(pk, m2, rng)
        np.testing.assert_array_equal(ctx.decrypt(sk, ctx.add(c1, c2)),
                                      (m1 + m2) % t)
        np.testing.assert_array_equal(ctx.decrypt(sk, ctx.sub(c1, c2)),
                                      (m1 - m2) % t)
    elif case == "neg_scalar":
        got = ctx.decrypt(sk, ctx.mul_plain(c1, np.full(N, 3)))
        np.testing.assert_array_equal(got, (3 * m1) % t)
    elif case == "mul_relin":
        c2 = ctx.encrypt(pk, m2, rng)
        got = ctx.decrypt(sk, ctx.mul(c1, c2, evk, technique=technique))
        np.testing.assert_array_equal(got, (m1 * m2) % t)
    elif case == "mod_reduce":
        pytest.skip("BFV is scale-invariant (no ModReduce)")
    elif case == "rotate":
        out = ctx.rotate(c1, 1, rot)
        want = _automorph_decode(bgv, m1, t, N)
        np.testing.assert_array_equal(ctx.decrypt(sk, out), want)
    elif case == "serialize":
        from fhe_tpu.utils import serial
        back = serial.loads(serial.dumps(c1))
        np.testing.assert_array_equal(np.asarray(back.c0.data),
                                      np.asarray(c1.c0.data))


def _automorph_decode(bgv_mod, m, t, N):
    """Plaintext result of the k=5 automorphism on a packed message
    (the rotation's slot-permutation semantics, mod-t NTT layout)."""
    coeffs = bgv_mod.encode(m, t, N)
    out = np.zeros(N, dtype=np.int64)
    for i in range(N):
        e = (i * 5) % (2 * N)
        sgn = 1 if e < N else -1
        out[e % N] = (out[e % N] + sgn * coeffs[i]) % t
    return bgv_mod.decode(out, t, N)


# ---------------------------------------------------------------------------
# LWE layer per named paramset (UnitTestFHEW per-set coverage, no
# bootstrap): encrypt/decrypt roundtrip + modulus switch
# ---------------------------------------------------------------------------

LWE_SETS = list(tp.PARAM_SETS)


@pytest.mark.parametrize("name", LWE_SETS)
def test_lwe_roundtrip_all_sets(name, rng):
    p = tp.make_params(name)
    sk = lwe.keygen(p, rng)
    m = np.array([0, 1, 2, 3]) % 4
    ct = lwe.encrypt(p, sk, m, rng, p=4)
    got = np.asarray(lwe.decrypt(p, sk, ct, p=4))
    np.testing.assert_array_equal(got, m)


@pytest.mark.parametrize("name", LWE_SETS)
def test_lwe_mod_switch_all_sets(name, rng):
    p = tp.make_params(name)
    sk = lwe.keygen(p, rng)
    m = np.array([0, 1, 2, 3]) % 4
    ct = lwe.encrypt(p, sk, m, rng, p=4)
    half = lwe.mod_switch(ct, ct.modulus // 2)
    assert half.modulus == ct.modulus // 2
