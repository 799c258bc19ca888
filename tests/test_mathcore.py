"""Core math parity tests: DFT (dftransform analogue), Chebyshev/Hermite
coefficient generators, Strassen matrix mult, samplers, Field2n, RLWE
trapdoor + Gaussian preimage sampling."""

import numpy as np
import pytest

from fhe_tpu.math import dft, approx, matrix, samplers, primes
from fhe_tpu.lattice import field2n, trapdoor


def test_dft_special_roundtrip(rng):
    c = rng.normal(size=64)
    v = dft.forward_special(c)
    back = dft.inverse_special(v)
    np.testing.assert_allclose(back.real, c, atol=1e-10)
    # evaluation semantics: v[j] = sum_k c_k zeta^{k(2j+1)}
    N = 64
    zeta = np.exp(1j * np.pi / N)
    j = 3
    want = sum(c[k] * zeta ** (k * (2 * j + 1)) for k in range(N))
    np.testing.assert_allclose(v[j], want, atol=1e-9)


def test_chebyshev_coefficients():
    cs = approx.chebyshev_coefficients(np.exp, -1, 1, 12)
    y = np.linspace(-1, 1, 101)
    np.testing.assert_allclose(np.polynomial.chebyshev.chebval(y, cs),
                               np.exp(y), atol=1e-9)
    cs2 = approx.chebyshev_fit(np.sin, -2, 2, tol=1e-8)
    y2 = np.linspace(-2, 2, 101)
    t = 2 * (y2 + 2) / 4 - 1
    np.testing.assert_allclose(np.polynomial.chebyshev.chebval(t, cs2),
                               np.sin(y2), atol=1e-7)


def test_hermite_trig():
    theta = 2 * np.pi * np.arange(8) / 8
    f = np.cos(theta) + 2 * np.sin(2 * theta)
    cs = approx.hermite_trig_coefficients(f)
    got = approx.hermite_trig_eval(cs, theta)
    np.testing.assert_allclose(got.real, f, atol=1e-9)


def test_strassen_matches_schoolbook(rng):
    q = 1 << 30
    A = rng.integers(0, q, size=(100, 70))
    B = rng.integers(0, q, size=(70, 130))
    want = matrix.mat_mul_mod(A, B, q)
    old = matrix.STRASSEN_CUTOFF
    matrix.STRASSEN_CUTOFF = 16       # force recursion
    try:
        got = matrix.strassen_mul_mod(A, B, q)
    finally:
        matrix.STRASSEN_CUTOFF = old
    np.testing.assert_array_equal(got, want)


def test_samplers(rng):
    g = samplers.discrete_gaussian_cdt(rng, 3.19, 4000)
    assert abs(g.std() - 3.19) < 0.25 and abs(g.mean()) < 0.25
    p = samplers.discrete_gaussian_peikert(rng, 20.0, 4000)
    assert abs(p.std() - 20.0) / 20.0 < 0.15
    t = samplers.ternary_uniform(rng, 300, h=64)
    assert (t != 0).sum() == 64 and set(np.unique(t)) <= {-1, 0, 1}


def test_field2n_ops(rng):
    a = field2n.Field2n.from_coeffs(rng.normal(size=32))
    b = field2n.Field2n.from_coeffs(rng.normal(size=32))
    prod = (a * b).to_coeff().real_coeffs()
    # reference negacyclic product
    want = np.zeros(32)
    ac, bc = a.real_coeffs(), b.real_coeffs()
    for i in range(32):
        for j in range(32):
            if i + j < 32:
                want[i + j] += ac[i] * bc[j]
            else:
                want[i + j - 32] -= ac[i] * bc[j]
    np.testing.assert_allclose(prod, want, atol=1e-8)
    inv = (a * a.inverse()).to_coeff().real_coeffs()
    one = np.zeros(32)
    one[0] = 1
    np.testing.assert_allclose(inv, one, atol=1e-8)
    tr = a.transpose().to_coeff().real_coeffs()
    want_tr = np.concatenate([[ac[0]], -ac[:0:-1]])
    np.testing.assert_allclose(tr, want_tr, atol=1e-8)


def test_trapdoor_preimage(rng):
    params = trapdoor.TrapdoorParams(N=64,
                                     q=primes.last_prime(12, 128), base=2)
    td = trapdoor.trapdoor_gen(params, rng)
    u = rng.integers(0, params.q, size=params.N)
    x = trapdoor.gauss_samp(td, u, rng)
    assert trapdoor.verify_preimage(td, x, u)
    # preimage entries stay small relative to q (short vector)
    xc = np.where(x > params.q // 2, x - params.q, x)
    assert np.abs(xc).max() < params.q // 4


def test_trapdoor_preimage_corrected(rng):
    """Full MP12 pipeline (dgsampling parity): randomized G-sampling +
    covariance-corrected perturbation; preimages stay correct, short,
    and ~spherical at width s."""
    params = trapdoor.TrapdoorParams(N=64,
                                     q=primes.last_prime(27, 128), base=2)
    td = trapdoor.trapdoor_gen(params, rng)
    u = rng.integers(0, params.q, size=params.N)
    x = trapdoor.gauss_samp_corrected(td, u, rng)
    assert trapdoor.verify_preimage(td, x, u)
    xc = np.where(x > params.q // 2, x - params.q, x).astype(np.float64)
    alpha = params.sigma * (params.base + 1)
    import math
    s = alpha * params.sigma * 1.2 * (math.sqrt(2 * params.N) +
                                      math.sqrt(params.k * params.N) + 4.7)
    assert np.abs(xc).max() < 10 * s            # short relative to width
    std = xc.std()
    assert 0.2 * s < std < 3.0 * s              # spherical-ish scale
