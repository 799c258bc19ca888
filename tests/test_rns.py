"""RNS/DCRT layer tests: batched multi-modulus NTT, ring ops, CRT basis
switching, rescaling -- exact checks against big-int CRT reconstruction
(the analogue of the reference's UnitTestDCRTElements.cpp).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fhe_tpu.lattice import rns
from fhe_tpu.math import primes

N = 64
MODS = tuple(primes.generate_ntt_primes(28, 2 * N, 4))
EXT = tuple(primes.generate_ntt_primes(29, 2 * N, 3))


def rand_poly(rng, mods, shape=()):
    data = np.stack(
        [rng.integers(0, q, size=shape + (N,), dtype=np.int64) for q in mods],
        axis=-2).astype(np.uint32)
    return rns.RnsPoly(jnp.asarray(data), tuple(mods), rns.COEFF)


def test_ntt_roundtrip_multilimb(rng):
    p = rand_poly(rng, MODS, shape=(3,))
    e = rns.to_eval(p)
    back = rns.to_coeff(e)
    np.testing.assert_array_equal(np.asarray(back.data), np.asarray(p.data))


def test_ntt_matches_single_limb_plans(rng):
    """The stacked multi-modulus butterfly must equal per-limb transforms."""
    from fhe_tpu.math import ntt as nttmod
    p = rand_poly(rng, MODS)
    e = rns.to_eval(p)
    for i, q in enumerate(MODS):
        plan = nttmod.make_plan(N, q)
        want = np.asarray(nttmod.forward_butterfly(
            plan, jnp.asarray(np.asarray(p.data)[i])))
        np.testing.assert_array_equal(np.asarray(e.data)[i], want)


def test_add_mul_vs_bigint(rng):
    a = rand_poly(rng, MODS)
    b = rand_poly(rng, MODS)
    ea, eb = rns.to_eval(a), rns.to_eval(b)
    s = rns.to_coeff(rns.add(ea, eb))
    m = rns.to_coeff(rns.mul(ea, eb))
    A = rns.to_bigint(a)
    B = rns.to_bigint(b)
    Q = 1
    for q in MODS:
        Q *= q
    np.testing.assert_array_equal(rns.to_bigint(s), (A + B) % Q)
    # negacyclic product
    want = np.zeros(N, dtype=object)
    for i in range(N):
        for j in range(N):
            k, sgn = (i + j, 1) if i + j < N else (i + j - N, -1)
            want[k] = (want[k] + sgn * A[i] * B[j]) % Q
    np.testing.assert_array_equal(rns.to_bigint(m), want)


def test_scalar_mul(rng):
    a = rand_poly(rng, MODS)
    c = 123456789
    got = rns.to_bigint(rns.mul_scalar(a, c))
    Q = 1
    for q in MODS:
        Q *= q
    np.testing.assert_array_equal(got, (rns.to_bigint(a) * c) % Q)


def test_switch_crt_basis_approx(rng):
    """out = x + u*Q (mod p_j) with 0 <= u < L (dcrtpoly-impl.h:910)."""
    a = rand_poly(rng, MODS)
    out = rns.switch_crt_basis_approx(a, EXT)
    A = rns.to_bigint(a)
    Q = 1
    for q in MODS:
        Q *= q
    got = np.asarray(out.data)
    ok = np.zeros(N, dtype=bool)
    for u in range(len(MODS) + 1):
        cand = A + u * Q
        match = np.ones(N, dtype=bool)
        for j, pj in enumerate(EXT):
            match &= got[j] == np.array([int(x) % pj for x in cand],
                                        dtype=np.uint32)
        ok |= match
    assert ok.all()


def test_approx_mod_down(rng):
    """For y on the full QP basis, ModDown(y) = floor(y/P) - v with
    0 <= v < L_P (the +v*P slack of the approximate basis switch divided
    by P) -- the HYBRID keyswitch property (dcrtpoly-impl.h ApproxModDown).
    """
    Q = 1
    for q in MODS:
        Q *= q
    P = 1
    for q in EXT:
        P *= q
    y = np.array([int(v) for v in
                  rng.integers(0, 1 << 62, size=N, dtype=np.int64)],
                 dtype=object)
    y = (y * y) % (Q * P)  # spread over the full QP range
    up = rns.from_bigint(y, MODS + EXT, N)
    down = rns.approx_mod_down(up, MODS, EXT)
    D = rns.to_bigint(down)
    want = y // P
    err = np.array([int((w - d) % Q) for d, w in zip(D, want)])
    assert np.all((err >= 0) & (err < len(EXT) + 1))


def test_drop_last_and_scale(rng):
    a = rand_poly(rng, MODS)
    out = rns.drop_last_element_and_scale(a)
    assert out.moduli == MODS[:-1]
    A = rns.to_bigint(a)
    qL = MODS[-1]
    want = np.array([(int(x) - int(x) % qL) // qL for x in A], dtype=object)
    Qk = 1
    for q in MODS[:-1]:
        Qk *= q
    np.testing.assert_array_equal(rns.to_bigint(out), want % Qk)


def test_automorphism(rng):
    a = rand_poly(rng, MODS)
    k = 5
    got = rns.to_coeff(rns.automorphism(rns.to_eval(a), k))
    A = rns.to_bigint(a)
    Q = 1
    for q in MODS:
        Q *= q
    want = np.zeros(N, dtype=object)
    for i in range(N):
        e = (i * k) % (2 * N)
        sgn = 1 if e < N else -1
        want[e % N] = (want[e % N] + sgn * A[i]) % Q
    np.testing.assert_array_equal(rns.to_bigint(got), want)
