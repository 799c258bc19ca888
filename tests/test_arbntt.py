"""Bluestein / arbitrary-cyclotomic NTT tests (reference
UnitTestTransform.cpp CRT_ARB cases; transformnat-impl.h:861-1150)."""

import math

import numpy as np
import pytest

from fhe_tpu.math import ntt_arb, primes


def _q_for(m: int, bits: int = 28) -> int:
    return primes.first_prime(bits, 2 * m)


@pytest.mark.parametrize("m", [7, 12, 15, 24])
def test_bluestein_matches_naive_dft(m):
    q = _q_for(m)
    rng = np.random.default_rng(m)
    x = rng.integers(0, q, size=m)
    got = ntt_arb.bluestein_dft(x, m, q)
    pl = ntt_arb.bluestein_plan(m, q)
    w = pow(pl.psi, 2, q)
    naive = np.array([
        sum(int(x[k]) * pow(w, j * k, q) for k in range(m)) % q
        for j in range(m)])
    assert (got == naive).all()


@pytest.mark.parametrize("m", [7, 12, 15])
def test_bluestein_inverse_roundtrip(m):
    q = _q_for(m)
    rng = np.random.default_rng(m + 100)
    x = rng.integers(0, q, size=m)
    spec = ntt_arb.bluestein_dft(x, m, q)
    back = ntt_arb.bluestein_dft(spec, m, q, inverse=True)
    assert (back == x).all()


def test_cyclotomic_polys():
    assert ntt_arb.cyclotomic_poly(12) == (1, 0, -1, 0, 1)      # x^4-x^2+1
    assert ntt_arb.cyclotomic_poly(15) == (1, -1, 0, 1, -1, 1, 0, -1, 1)
    assert ntt_arb.cyclotomic_poly(8) == (1, 0, 0, 0, 1)        # x^4+1


@pytest.mark.parametrize("m", [12, 15, 24])
def test_arb_transform_roundtrip(m):
    q = _q_for(m)
    phi = len(ntt_arb.cyclotomic_poly(m)) - 1
    rng = np.random.default_rng(m + 7)
    poly = rng.integers(0, q, size=phi)
    vals = ntt_arb.forward_arb(poly, m, q)
    assert len(vals) == phi
    back = ntt_arb.inverse_arb(vals, m, q)
    assert (back == poly).all()


@pytest.mark.parametrize("m", [12, 15])
def test_arb_multiply_matches_schoolbook(m):
    q = _q_for(m)
    phi = len(ntt_arb.cyclotomic_poly(m)) - 1
    rng = np.random.default_rng(m + 21)
    a = rng.integers(0, q, size=phi)
    b = rng.integers(0, q, size=phi)
    got = ntt_arb.multiply_arb(a, b, m, q)
    # schoolbook product then reduce mod (Phi_m, q)
    prod = np.zeros(2 * phi - 1, dtype=object)
    for i in range(phi):
        for j in range(phi):
            prod[i + j] += int(a[i]) * int(b[j])
    want = ntt_arb._poly_mod_cyclo(prod % q, m, q)
    assert (got == want).all()
