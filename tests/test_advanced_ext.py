"""Extended AdvancedSHE surface: EvalSumRows/Cols, EvalMerge,
EvalAddMany/MultMany, EvalNegate, Compress, and the Chebyshev function-
evaluation conveniences (EvalSin/Cos/Logistic/Divide) -- reference
base-advancedshe.cpp:193-420, cryptocontext.cpp:373-525 and the
function-evaluation.cpp example."""

import numpy as np
import pytest

from fhe_tpu.pke import ckks, advanced

N = 256
SLOTS = N // 2


@pytest.fixture(scope="module")
def setup():
    ctx = ckks.CkksContext.create(N=N, num_levels=8, scale_bits=26, dnum=2)
    rng = np.random.default_rng(31)
    sk, pk = ctx.keygen(rng)
    evk = ctx.relin_key_gen(sk, rng)
    return ctx, sk, pk, evk, rng


def test_eval_sum_rows(setup):
    ctx, sk, pk, _, rng = setup
    rows, cols = 4, SLOTS // 4
    M = rng.normal(size=(rows, cols))
    ct = ctx.encrypt(pk, M.reshape(-1), rng)
    keys = advanced.sum_rows_key_gen(ctx, sk, rng, cols)
    out = ctx.decrypt(sk, advanced.eval_sum_rows(ctx, ct, cols, keys))
    want = np.tile(M.sum(axis=0), rows)
    np.testing.assert_allclose(out.real, want, atol=1e-2)


def test_eval_sum_cols(setup):
    ctx, sk, pk, _, rng = setup
    cols = 8
    rows = SLOTS // cols
    M = rng.normal(size=(rows, cols))
    ct = ctx.encrypt(pk, M.reshape(-1), rng)
    keys = advanced.sum_cols_key_gen(ctx, sk, rng, cols)
    out = ctx.decrypt(sk, advanced.eval_sum_cols(ctx, ct, cols, keys))
    want = np.repeat(M.sum(axis=1), cols)
    np.testing.assert_allclose(out.real, want, atol=2e-2)


def test_eval_merge(setup):
    ctx, sk, pk, _, rng = setup
    zs = [rng.normal(size=SLOTS) for _ in range(4)]
    cts = [ctx.encrypt(pk, z, rng) for z in zs]
    keys = advanced.merge_key_gen(ctx, sk, rng, 4)
    out = ctx.decrypt(sk, advanced.eval_merge(ctx, cts, keys))
    want = np.array([z[0] for z in zs])
    np.testing.assert_allclose(out.real[:4], want, atol=1e-2)
    np.testing.assert_allclose(out.real[4:], 0.0, atol=1e-2)


def test_add_many_mult_many(setup):
    ctx, sk, pk, evk, rng = setup
    zs = [rng.uniform(0.3, 0.9, size=SLOTS) for _ in range(5)]
    cts = [ctx.encrypt(pk, z, rng) for z in zs]
    out = ctx.decrypt(sk, advanced.eval_add_many(ctx, cts))
    np.testing.assert_allclose(out.real, np.sum(zs, axis=0), atol=1e-2)
    out = ctx.decrypt(sk, advanced.eval_mult_many(ctx, cts, evk))
    np.testing.assert_allclose(out.real, np.prod(zs, axis=0), atol=2e-2)


def test_negate_compress(setup):
    ctx, sk, pk, _, rng = setup
    z = rng.normal(size=SLOTS)
    ct = ctx.encrypt(pk, z, rng)
    np.testing.assert_allclose(
        ctx.decrypt(sk, advanced.eval_negate(ctx, ct)).real, -z, atol=1e-2)
    small = advanced.compress(ctx, ct, towers_left=1)
    assert len(small.moduli) == ctx.cd
    np.testing.assert_allclose(ctx.decrypt(sk, small).real, z, atol=1e-2)


def test_eval_logistic(setup):
    ctx, sk, pk, evk, rng = setup
    z = rng.uniform(-4, 4, size=SLOTS)
    ct = ctx.encrypt(pk, z, rng)
    out = ctx.decrypt(sk, advanced.eval_logistic(ctx, ct, -5, 5, 16, evk))
    np.testing.assert_allclose(out.real, 1 / (1 + np.exp(-z)), atol=2e-2)


def test_eval_sin_cos(setup):
    ctx, sk, pk, evk, rng = setup
    z = rng.uniform(-1.0, 1.0, size=SLOTS)
    ct = ctx.encrypt(pk, z, rng)
    out = ctx.decrypt(sk, advanced.eval_sin(ctx, ct, -1.5, 1.5, 12, evk))
    np.testing.assert_allclose(out.real, np.sin(z), atol=2e-2)
    out = ctx.decrypt(sk, advanced.eval_cos(ctx, ct, -1.5, 1.5, 12, evk))
    np.testing.assert_allclose(out.real, np.cos(z), atol=2e-2)


def test_eval_divide(setup):
    ctx, sk, pk, evk, rng = setup
    z = rng.uniform(1.0, 3.0, size=SLOTS)
    ct = ctx.encrypt(pk, z, rng)
    out = ctx.decrypt(sk, advanced.eval_divide(ctx, ct, 0.8, 3.2, 24, evk))
    np.testing.assert_allclose(out.real, 1.0 / z, atol=3e-2)


@pytest.mark.slow
def test_eval_poly_ps_and_precomp(rng):
    """EvalPolyPS (exact poly2cheb change of basis onto the PS Chebyshev
    evaluator) and EvalPowers/EvalPolyWithPrecomp match the linear chain."""
    from fhe_tpu.pke.advanced import (eval_poly, eval_poly_ps, eval_powers,
                                      eval_poly_with_precomp)
    ctx = ckks.CkksContext.create(N=N, num_levels=8, scale_bits=26, dnum=2)
    sk, pk = ctx.keygen(rng)
    evk = ctx.relin_key_gen(sk, rng)
    z = rng.uniform(-1, 1, size=N // 2)
    ct = ctx.encrypt(pk, z, rng)
    coeffs = [0.5, -1.0, 0.25, 0.125, -0.0625]   # quartic
    want = sum(c * z**k for k, c in enumerate(coeffs))

    got_lin = ctx.decrypt(sk, eval_poly(ctx, ct, coeffs, evk)).real
    np.testing.assert_allclose(got_lin, want, atol=2e-2)

    got_ps = ctx.decrypt(sk, eval_poly_ps(ctx, ct, coeffs, evk)).real
    np.testing.assert_allclose(got_ps, want, atol=2e-2)

    pws = eval_powers(ctx, ct, 4, evk)
    got_pc = ctx.decrypt(
        sk, eval_poly_with_precomp(ctx, pws, coeffs, evk)).real
    np.testing.assert_allclose(got_pc, want, atol=2e-2)


def test_square_and_raw_automorphism(rng):
    """EvalSquare on BGV/BFV facades + raw EvalAutomorphism(KeyGen) on
    CKKS (galois element 5 = slot rotation by 1)."""
    from fhe_tpu.pke import bgv, bfv
    bctx = bgv.BgvContext.create(N=N, num_levels=2, plain_mod=65537,
                                 mod_bits=28, dnum=2)
    sk, pk = bctx.keygen(rng)
    evk = bctx.relin_key_gen(sk, rng)
    m = rng.integers(0, 100, size=N)
    ct = bctx.encrypt(pk, m, rng)
    got = bctx.decrypt(sk, bctx.square(ct, evk))
    np.testing.assert_array_equal(got, (m * m) % 65537)

    fctx = bfv.BfvContext.create(N=N, num_limbs=3, plain_mod=65537,
                                 dnum=2)
    fsk, fpk = fctx.keygen(rng)
    fevk = fctx.relin_key_gen(fsk, rng)
    fct = fctx.encrypt(fpk, m, rng)
    fgot = fctx.decrypt(fsk, fctx.square(fct, fevk))
    np.testing.assert_array_equal(fgot, (m * m) % 65537)

    cctx = ckks.CkksContext.create(N=N, num_levels=3, scale_bits=28,
                                   dnum=2)
    csk, cpk = cctx.keygen(rng)
    ak = cctx.automorphism_key_gen(csk, [5], rng)
    z = rng.normal(size=N // 2)
    cct = cctx.encrypt(cpk, z, rng)
    rot = cctx.automorphism(cct, 5, ak[5])
    got_c = cctx.decrypt(csk, rot).real
    np.testing.assert_allclose(got_c, np.roll(z, -1), atol=1e-3)
