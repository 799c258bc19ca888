"""Pallas fused-NTT kernel tests: bit-exact parity against the XLA
butterfly reference (the reference's CPU-vs-GPU byte-equality strategy,
UnitTestMLX.cpp:40-116), run in interpreter mode on CPU."""

import numpy as np
import jax.numpy as jnp
import pytest

from fhe_tpu.math import ntt as nttmod, ntt_pallas as ntp, primes


@pytest.mark.parametrize("N,q_bits", [(512, 27), (1024, 28), (2048, 27)])
def test_pallas_forward_inverse_bit_exact(N, q_bits, rng):
    q = primes.last_prime(q_bits, 2 * N)
    plan = nttmod.make_plan(N, q)
    x = jnp.asarray(rng.integers(0, q, size=(6, N)).astype(np.uint32))
    ref_f = nttmod.forward_butterfly(plan, x)
    got_f = ntp.forward_pallas(plan, x)
    np.testing.assert_array_equal(np.asarray(ref_f), np.asarray(got_f))
    ref_i = nttmod.inverse_butterfly(plan, ref_f)
    got_i = ntp.inverse_pallas(plan, got_f)
    np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(got_i))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(x))


def test_pallas_dispatch(rng):
    N, q = 512, primes.last_prime(27, 1024)
    plan = nttmod.make_plan(N, q)
    x = jnp.asarray(rng.integers(0, q, size=(3, N)).astype(np.uint32))
    a = nttmod.ntt_forward(plan, x, impl="pallas")
    b = nttmod.ntt_forward(plan, x, impl="butterfly")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pallas_negacyclic_mul(rng):
    """End-to-end polynomial product through the pallas path."""
    N, q = 512, primes.last_prime(27, 1024)
    plan = nttmod.make_plan(N, q)
    a = jnp.asarray(rng.integers(0, q, size=(2, N)).astype(np.uint32))
    b = jnp.asarray(rng.integers(0, q, size=(2, N)).astype(np.uint32))
    got = nttmod.negacyclic_mul(plan, a, b, impl="pallas")
    want = nttmod.negacyclic_mul(plan, a, b, impl="butterfly")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
