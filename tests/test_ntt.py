"""NTT correctness: butterfly and MXU paths vs exact integer references.

Mirrors the reference's UnitTestNTT/UnitTestTransform (src/core/unittest/):
roundtrip, linearity, negacyclic convolution theorem, and cross-path
bit-equality (the TPU analogue of the reference's CPU<->MLX byte-equality
parity tests, src/core/unittest/UnitTestMLX.cpp:40-116).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fhe_tpu.math import ntt, primes
from fhe_tpu.math.modmath import mont_constants


PARAMS = [
    (64, primes.last_prime(27, 2048)),     # STD128 ring modulus, small N
    (256, 12289),
    (1024, primes.last_prime(27, 2048)),   # STD128 actual ring
    (2048, primes.last_prime(28, 4096)),   # MEDIUM ring
]


def _matvec_mod(W, x, q):
    """Exact (W @ x) mod q for entries < q < 2^31, via uint64 with per-term
    reduction (products < 2^62; reduced terms < 2^31 sum safely)."""
    prods = (W.astype(np.uint64) * x.astype(np.uint64)) % q
    return (prods.sum(axis=1) % q).astype(np.uint32)


def naive_negacyclic_mul(a, b, q):
    """Exact negacyclic product: res[k] = sum_j a[j] * b[k-j], with the
    wrap-around terms (j > k) negated."""
    n = len(a)
    j = np.arange(n)
    W = np.zeros((n, n), dtype=np.uint64)
    for k in range(n):
        vals = b[(k - j) % n].astype(np.int64)
        vals[j > k] = -vals[j > k]
        W[k] = vals % q
    return _matvec_mod(W, a, q)


def naive_ntt(x, plan):
    """Direct evaluation eval[k] = a(psi^(2k+1)) with exact ints."""
    N, q, psi = plan.N, plan.q, plan.psi
    pts = np.array([pow(psi, 2 * k + 1, q) for k in range(N)], dtype=np.uint64)
    # W[k, i] = pts[k]^i via cumulative product mod q
    W = np.ones((N, N), dtype=np.uint64)
    for i in range(1, N):
        W[:, i] = W[:, i - 1] * pts % q
    return _matvec_mod(W, x, q)


@pytest.mark.parametrize("N,q", PARAMS[:2])
def test_forward_matches_naive(rng, N, q):
    plan = ntt.make_plan(N, q)
    x = rng.integers(0, q, size=N, dtype=np.uint64).astype(np.uint32)
    want = naive_ntt(x, plan)
    got_bf = np.asarray(ntt.forward_butterfly(plan, jnp.asarray(x)))
    got_mx = np.asarray(ntt.forward_mxu(plan, jnp.asarray(x[None]))[0])
    np.testing.assert_array_equal(got_bf, want)
    np.testing.assert_array_equal(got_mx, want)


@pytest.mark.parametrize("N,q", PARAMS)
def test_roundtrip_and_cross_path(rng, N, q):
    plan = ntt.make_plan(N, q)
    x = rng.integers(0, q, size=(4, N), dtype=np.uint64).astype(np.uint32)
    xj = jnp.asarray(x)
    e_bf = ntt.forward_butterfly(plan, xj)
    e_mx = ntt.forward_mxu(plan, xj)
    np.testing.assert_array_equal(np.asarray(e_bf), np.asarray(e_mx))
    np.testing.assert_array_equal(
        np.asarray(ntt.inverse_butterfly(plan, e_bf)), x)
    np.testing.assert_array_equal(np.asarray(ntt.inverse_mxu(plan, e_bf)), x)


@pytest.mark.parametrize("N,q", [(256, 12289), (1024, primes.last_prime(27, 2048))])
def test_negacyclic_convolution(rng, N, q):
    plan = ntt.make_plan(N, q)
    a = rng.integers(0, q, size=N, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, q, size=N, dtype=np.uint64).astype(np.uint32)
    want = naive_negacyclic_mul(a, b, q)
    for impl in ("butterfly", "mxu"):
        got = np.asarray(ntt.negacyclic_mul(
            plan, jnp.asarray(a[None]), jnp.asarray(b[None]), impl)[0])
        np.testing.assert_array_equal(got, want)


def test_signed2_matches_full(rng):
    N, q = 1024, primes.last_prime(27, 2048)
    plan = ntt.make_plan(N, q)
    # small signed inputs (gadget digits, |x| <= Bg/2 = 256)
    x = rng.integers(-256, 257, size=(8, N), dtype=np.int64)
    lo, hi = ntt.balanced_base128(jnp.asarray(x.astype(np.int32)))
    got = np.asarray(ntt.forward_mxu_signed2(plan, lo, hi))
    x_mod = (x % q).astype(np.uint32)
    want = np.asarray(ntt.forward_butterfly(plan, jnp.asarray(x_mod)))
    np.testing.assert_array_equal(got, want)


def test_pointwise_mont(rng):
    N, q = 256, 12289
    plan = ntt.make_plan(N, q)
    a = rng.integers(0, q, size=N, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, q, size=N, dtype=np.uint64).astype(np.uint32)
    bm = ((b.astype(np.uint64) << 32) % q).astype(np.uint32)
    got = np.asarray(ntt.pointwise_mont(plan, jnp.asarray(a), jnp.asarray(bm)))
    want = ((a.astype(np.uint64) * b) % q).astype(np.uint32)
    np.testing.assert_array_equal(got, want)
    got2 = np.asarray(ntt.pointwise_mul(plan, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(got2, want)
