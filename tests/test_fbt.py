"""CKKS functional bootstrapping (FBT) tests: arbitrary LUT evaluation
over coefficient-encoded RLWE digits, multi-value bootstrapping reuse,
Hermite coefficient interpolation properties, schemelet conversions --
reference utckksrns/UnitTestFBT.cpp + functional-bootstrapping-ckks.cpp."""

import numpy as np
import pytest

from fhe_tpu.pke import ckks, fbt


def test_hermite_coefficients_interpolate():
    """The trig Hermite series reproduces f at the p roots of unity and
    stays accurate under phase noise for order >= 2 (hermite.cpp port)."""
    for p, order, noise_tol in [(4, 1, 1e-3), (4, 2, 1e-5), (8, 2, 1e-4),
                                (8, 3, 1e-5)]:
        f = lambda x: (x % p - p // 2) % p
        c = fbt.get_hermite_trig_coefficients(f, p, order, 1.0)
        k = np.arange(len(c))
        for m in range(p):
            z = np.exp(2j * np.pi * m / p)
            val = 2 * np.real(np.sum(c * z ** k))
            assert abs(val - f(m)) < 1e-10
            zn = np.exp(2j * np.pi * (m + 1e-3 * p) / p)
            vn = 2 * np.real(np.sum(c * zn ** k))
            assert abs(vn - f(m)) < noise_tol * p


def test_schemelet_roundtrip():
    """SchemeletRLWEMP EncryptCoeff/DecryptCoeff + power-of-two modulus
    switch under the shared CKKS secret."""
    ctx = ckks.CkksContext.create(N=128, num_levels=3, scale_bits=26,
                                  dnum=2)
    rng = np.random.default_rng(5)
    sk, _ = ctx.keygen(rng, h=4)
    msg = rng.integers(0, 16, size=128)
    ct = fbt.encrypt_coeff(ctx, sk, msg, 1 << 40, 16, rng)
    np.testing.assert_array_equal(fbt.decrypt_coeff(ctx, sk, ct, 16), msg)
    low = fbt.mod_switch(ct, 1 << 33)
    np.testing.assert_array_equal(fbt.decrypt_coeff(ctx, sk, low, 16), msg)


@pytest.fixture(scope="module")
def fbt_ctx():
    N = 256
    ctx = ckks.CkksContext.create(N=N, num_levels=18, scale_bits=26,
                                  dnum=3, first_bits=30)
    rng = np.random.default_rng(42)
    sk, pk = ctx.keygen(rng, h=4)
    precom = fbt.setup(ctx, h=4, r=2)
    keys = fbt.keygen(ctx, sk, precom, rng)
    return ctx, sk, precom, keys, rng


@pytest.mark.slow
def test_arbitrary_lut_fully_packed(fbt_ctx):
    """4-bit-in/4-bit-out LUT over all N coefficients (ArbitraryLUT
    fully packed, order 2)."""
    ctx, sk, precom, keys, rng = fbt_ctx
    N = ctx.params.N
    p_in = p_out = 4
    big_q = 1 << 33
    func = lambda x: (x % p_in - p_in // 2) % p_in
    coeffs = fbt.get_hermite_trig_coefficients(func, p_in, 2, 1.0)
    msg = rng.integers(0, p_in, size=N)
    ct_rlwe = fbt.encrypt_coeff(ctx, sk, msg, big_q, p_in, rng)
    ct = fbt.convert_rlwe_to_ckks(ctx, ct_rlwe)
    out = fbt.eval_fbt(ctx, ct, coeffs, precom, keys)
    out_rlwe = fbt.convert_ckks_to_rlwe(ctx, out, big_q, target_delta=big_q / p_out)
    got = fbt.decrypt_coeff(ctx, sk, out_rlwe, p_out)
    want = np.array([func(int(m)) % p_out for m in msg])
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_multi_value_bootstrap(fbt_ctx):
    """Two LUTs over the same input reusing one exponential power basis
    (MultiValueBootstrapping)."""
    ctx, sk, precom, keys, rng = fbt_ctx
    N = ctx.params.N
    p = 4
    big_q = 1 << 33
    f1 = lambda x: (x * x) % p
    f2 = lambda x: (3 * x + 1) % p
    c1 = fbt.get_hermite_trig_coefficients(f1, p, 2, 1.0)
    c2 = fbt.get_hermite_trig_coefficients(f2, p, 2, 1.0)
    msg = rng.integers(0, p, size=N)
    ct_rlwe = fbt.encrypt_coeff(ctx, sk, msg, big_q, p, rng)
    ct = fbt.convert_rlwe_to_ckks(ctx, ct_rlwe)
    deg = max(len(c1), len(c2)) - 1
    sp = fbt.eval_mvb_precompute(ctx, ct, precom, keys, deg)
    for f, c in [(f1, c1), (f2, c2)]:
        enc = fbt.eval_mvb_no_decoding(ctx, sp, c, precom, keys)
        out = fbt.eval_hom_decoding(ctx, enc, precom, keys)
        got = fbt.decrypt_coeff(
            ctx, sk, fbt.convert_ckks_to_rlwe(ctx, out, big_q,
                                              target_delta=big_q / p), p)
        want = np.array([f(int(m)) % p for m in msg])
        np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_arbitrary_lut_sparse():
    """Sparsely packed LUT: numValues < N digits (ArbitraryLUT sparse,
    the partial-sum/rect-transform pipeline)."""
    N = 256
    ctx = ckks.CkksContext.create(N=N, num_levels=18, scale_bits=26,
                                  dnum=3, first_bits=30)
    rng = np.random.default_rng(43)
    sk, pk = ctx.keygen(rng, h=4)
    num_values = 64                       # d = N / num_values = 4
    precom = fbt.setup(ctx, h=4, r=2, slots=num_values // 2)
    keys = fbt.keygen(ctx, sk, precom, rng)
    p = 4
    big_q = 1 << 33
    func = lambda x: (3 * x + 2) % p
    coeffs = fbt.get_hermite_trig_coefficients(func, p, 2, 1.0)
    msg = np.zeros(N, dtype=np.int64)
    stride = N // num_values
    vals = rng.integers(0, p, size=num_values)
    msg[::stride] = vals                  # subring coefficient placement
    ct_rlwe = fbt.encrypt_coeff(ctx, sk, msg, big_q, p, rng)
    ct = fbt.convert_rlwe_to_ckks(ctx, ct_rlwe, num_values=num_values)
    out = fbt.eval_fbt(ctx, ct, coeffs, precom, keys)
    out_rlwe = fbt.convert_ckks_to_rlwe(ctx, out, big_q,
                                        target_delta=big_q / p)
    got = fbt.decrypt_coeff(ctx, sk, out_rlwe, p)[::stride]
    want = np.array([func(int(v)) % p for v in vals])
    np.testing.assert_array_equal(got, want)


def test_get_fbt_depth():
    """GetFBTDepth analogue: monotone in LUT size, matches the depth the
    working test contexts were built with (18 levels for p=4, order 2)."""
    d4 = fbt.get_fbt_depth(4, order=2, h=4)
    d16 = fbt.get_fbt_depth(16, order=2, h=4)
    assert 12 <= d4 <= 18
    assert d16 >= d4
