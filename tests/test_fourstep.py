"""Four-step NTT tests (ntt_fourstep.h analogue): bit-exact parity with
the butterfly reference at N >= 8192, and auto-dispatch selection."""

import numpy as np
import jax.numpy as jnp
import pytest

from fhe_tpu.math import ntt as nttmod, ntt_fourstep as fs, primes


@pytest.mark.parametrize("N", [8192, 16384])
def test_fourstep_bit_exact(N, rng):
    q = primes.last_prime(27, 2 * N)
    plan = nttmod.make_plan(N, q)
    x = jnp.asarray(rng.integers(0, q, size=(3, N)).astype(np.uint32))
    ref = nttmod.forward_butterfly(plan, x)
    got = fs.forward_fourstep(plan, x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    back = fs.inverse_fourstep(plan, got)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_fourstep_negacyclic_mul(rng):
    N = 8192
    q = primes.last_prime(27, 2 * N)
    plan = nttmod.make_plan(N, q)
    a = jnp.asarray(rng.integers(0, q, size=(2, N)).astype(np.uint32))
    b = jnp.asarray(rng.integers(0, q, size=(2, N)).astype(np.uint32))
    got = nttmod.negacyclic_mul(plan, a, b, impl="fourstep")
    want = nttmod.negacyclic_mul(plan, a, b, impl="butterfly")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_auto_impl_selection():
    assert nttmod._auto_impl(1024) in ("mxu", "butterfly")
    # mxu must never be chosen at large N (the dense table would be GBs)
    import jax
    if jax.default_backend() == "tpu":
        assert nttmod._auto_impl(8192) == "fourstep"
