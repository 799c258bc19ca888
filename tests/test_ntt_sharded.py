"""Coefficient-axis sharded NTT (SURVEY P7): bit-exactness vs the
single-device four-step/butterfly paths on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from fhe_tpu.math import ntt as nttmod
from fhe_tpu.math import primes
from fhe_tpu.parallel import ntt_sharded as ns


def _mesh(d=8, axis="c"):
    devs = jax.devices()
    if len(devs) < d:
        pytest.skip(f"need {d} devices")
    return Mesh(np.array(devs[:d]), (axis,))


def _params(N=4096):
    q = primes.first_prime(28, 2 * N)
    return N, q


class TestShardedNtt:
    def test_forward_matches_butterfly(self, rng):
        N, q = _params()
        mesh = _mesh()
        plan = nttmod.make_plan(N, q)
        x = rng.integers(0, q, size=(4, N), dtype=np.uint32)
        ref = np.asarray(nttmod.forward_butterfly(plan, jnp.asarray(x)))

        fwd, (twist2, tw_f) = ns.forward_sharded(N, q, mesh)
        xs = ns.shard_coef(jnp.asarray(x), mesh)
        Y = fwd(xs, twist2, tw_f)
        got = np.asarray(ns.unshard_eval(Y))
        np.testing.assert_array_equal(got, ref)

    def test_roundtrip_bit_exact(self, rng):
        N, q = _params()
        mesh = _mesh()
        x = rng.integers(0, q, size=(3, N), dtype=np.uint32)
        fwd, ftabs = ns.forward_sharded(N, q, mesh)
        inv, itabs = ns.inverse_sharded(N, q, mesh)
        xs = ns.shard_coef(jnp.asarray(x), mesh)
        back = inv(fwd(xs, *ftabs), *itabs)
        np.testing.assert_array_equal(np.asarray(ns.unshard_coef(back)), x)

    def test_negacyclic_product(self, rng):
        """Full sharded pipeline = schoolbook negacyclic product."""
        N, q = _params(N=2048)
        mesh = _mesh()
        a = rng.integers(0, q, size=(2, N), dtype=np.uint64)
        b = rng.integers(0, q, size=(2, N), dtype=np.uint64)

        fn, tabs = ns.negacyclic_mul_sharded(N, q, mesh)
        As = ns.shard_coef(jnp.asarray(a.astype(np.uint32)), mesh)
        Bs = ns.shard_coef(jnp.asarray(b.astype(np.uint32)), mesh)
        got = np.asarray(ns.unshard_coef(fn(As, Bs, *tabs)))

        # schoolbook via numpy polymul mod (X^N+1, q), exact in object ints
        for i in range(a.shape[0]):
            full = np.convolve(a[i].astype(object), b[i].astype(object))
            red = np.zeros(N, dtype=object)
            red[: len(full) - N] -= full[N:]
            red[: min(N, len(full))] += full[: min(N, len(full))]
            ref = np.array([int(v) % q for v in red], dtype=np.uint32)
            np.testing.assert_array_equal(got[i], ref)

    def test_only_two_collectives(self):
        """The compiled forward contains exactly one all_to_all (the
        distributed transpose) -- no hidden resharding."""
        N, q = _params()
        mesh = _mesh()
        fwd, ftabs = ns.forward_sharded(N, q, mesh)
        xs = ns.shard_coef(jnp.zeros((2, N), jnp.uint32), mesh)
        txt = fwd.lower(xs, *ftabs).compile().as_text()
        assert "all-to-all" in txt
        assert "all-gather" not in txt and "all-reduce" not in txt
