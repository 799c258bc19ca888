"""BFV tests (utbfvrns analogue): exact SIMD mod-t arithmetic with HPS
multiplication, plus the exact basis-switch / scale-and-round primitives."""

import numpy as np
import pytest

from fhe_tpu.lattice import rns
from fhe_tpu.math import primes
from fhe_tpu.pke import bfv

N = 256
T = 65537


@pytest.fixture(scope="module")
def ctx():
    return bfv.BfvContext.create(N=N, num_limbs=3, plain_mod=T, mod_bits=28,
                                 dnum=2)


@pytest.fixture(scope="module")
def keys(ctx):
    rng = np.random.default_rng(17)
    sk, pk = ctx.keygen(rng)
    evk = ctx.relin_key_gen(sk, rng)
    return sk, pk, evk, rng


def test_switch_crt_basis_exact(rng):
    mods = tuple(primes.generate_ntt_primes(28, 2 * N, 3))
    ext = tuple(primes.generate_ntt_primes(30, 2 * N, 4))
    import jax.numpy as jnp
    data = np.stack([rng.integers(0, q, size=N, dtype=np.int64)
                     for q in mods], axis=-2).astype(np.uint32)
    p = rns.RnsPoly(jnp.asarray(data), mods, rns.COEFF)
    out = rns.switch_crt_basis_exact(p, ext)
    A = rns.to_bigint(p)
    got = np.asarray(out.data)
    for j, pj in enumerate(ext):
        want = np.array([int(x) % pj for x in A], dtype=np.uint32)
        np.testing.assert_array_equal(got[j], want)


def test_scale_and_round(rng):
    q_mods = tuple(primes.generate_ntt_primes(28, 2 * N, 3))
    r_mods = tuple(primes.generate_ntt_primes(30, 2 * N, 4))
    Q = int(np.prod([int(q) for q in q_mods], dtype=object))
    R = int(np.prod([int(r) for r in r_mods], dtype=object))
    t = T
    # V must satisfy t*V + Q/2 < Q*R
    vals = [int(v) % (Q * R // (2 * t)) for v in
            rng.integers(0, 1 << 62, size=N, dtype=np.uint64)]
    p = rns.from_bigint(np.array(vals, dtype=object), q_mods + r_mods, N)
    out = rns.scale_and_round_t_over_q(p, q_mods, r_mods, t)
    got = rns.to_bigint(out)
    for g, v in zip(got, vals):
        want = (t * v + Q // 2) // Q % R
        assert int(g) == want


def test_encrypt_decrypt(ctx, keys, rng):
    sk, pk, _, _ = keys
    m = rng.integers(0, T, size=N)
    ct = ctx.encrypt(pk, m, rng)
    np.testing.assert_array_equal(ctx.decrypt(sk, ct), m % T)


def test_add_and_plain_ops(ctx, keys, rng):
    sk, pk, _, _ = keys
    m1 = rng.integers(0, T, size=N)
    m2 = rng.integers(0, T, size=N)
    ct1 = ctx.encrypt(pk, m1, rng)
    ct2 = ctx.encrypt(pk, m2, rng)
    np.testing.assert_array_equal(ctx.decrypt(sk, ctx.add(ct1, ct2)),
                                  (m1 + m2) % T)
    np.testing.assert_array_equal(ctx.decrypt(sk, ctx.mul_plain(ct1, m2)),
                                  (m1 * m2) % T)


def test_mul_relin(ctx, keys, rng):
    sk, pk, evk, _ = keys
    m1 = rng.integers(0, T, size=N)
    m2 = rng.integers(0, T, size=N)
    ct1 = ctx.encrypt(pk, m1, rng)
    ct2 = ctx.encrypt(pk, m2, rng)
    prod = ctx.mul(ct1, ct2, evk)
    assert prod.c2 is None
    np.testing.assert_array_equal(ctx.decrypt(sk, prod), (m1 * m2) % T)


def test_behz_base_conversions(rng):
    """Unit KATs for the BEHZ kit: q->Bsk Montgomery conversion is exact
    (up to +Q), the RNS floor is within the alpha < L slack, and the
    Shenoy-Kumaresan return trip is exact."""
    q_mods = tuple(primes.generate_ntt_primes(28, 2 * N, 3))
    bsk = tuple(primes.generate_ntt_primes(30, 2 * N, 5))
    Q = 1
    for q in q_mods:
        Q *= q
    vals = np.array([int(v) % Q for v in
                     rng.integers(0, 1 << 62, size=N, dtype=np.uint64)],
                    dtype=object)
    p = rns.from_bigint(vals, q_mods, N)
    out = rns.fast_base_conv_q_to_bsk(p, bsk)
    got = np.asarray(out.data)
    for j, bj in enumerate(bsk):
        for x, g in zip(vals, got[j]):
            assert int(g) in (int(x) % bj, (int(x) + Q) % bj)

    # floor: y in both bases, y < Q * prod(B)/2
    Bprod = 1
    for b in bsk[:-1]:
        Bprod *= b
    ys = np.array([int(v) % (Q * Bprod // 4) for v in
                   rng.integers(0, 1 << 62, size=N, dtype=np.uint64)],
                  dtype=object)
    y_q = rns.from_bigint(ys, q_mods, N)
    y_bsk = rns.from_bigint(ys, bsk, N)
    fl = rns.to_bigint(rns.fast_rns_floor_q(y_q, y_bsk))
    Mbsk = Bprod * bsk[-1]
    for g, y in zip(fl, ys):
        alpha = (y // Q - int(g)) % Mbsk
        assert alpha < len(q_mods)

    # SK return: x < Bprod/2 exact
    xs = np.array([int(v) % (Bprod // 2) for v in
                   rng.integers(0, 1 << 62, size=N, dtype=np.uint64)],
                  dtype=object)
    x_bsk = rns.from_bigint(xs, bsk, N)
    back = np.asarray(rns.fast_base_conv_sk(x_bsk, q_mods).data)
    for j, qj in enumerate(q_mods):
        np.testing.assert_array_equal(
            back[j], np.array([int(x) % qj for x in xs], dtype=np.uint32))


def test_mul_behz(ctx, keys, rng):
    """BEHZ multiplicationTechnique decrypts identically to HPS
    (compare-bfv-hps-leveled-vs-behz.cpp analogue)."""
    sk, pk, evk, _ = keys
    m1 = rng.integers(0, T, size=N)
    m2 = rng.integers(0, T, size=N)
    ct1 = ctx.encrypt(pk, m1, rng)
    ct2 = ctx.encrypt(pk, m2, rng)
    prod = ctx.mul(ct1, ct2, evk, technique="behz")
    assert prod.c2 is None
    np.testing.assert_array_equal(ctx.decrypt(sk, prod), (m1 * m2) % T)


def test_dot_product(ctx, keys, rng):
    sk, pk, evk, _ = keys
    k = 4
    ms = [rng.integers(0, T, size=N) for _ in range(k)]
    ws = [rng.integers(0, T, size=N) for _ in range(k)]
    cts = [ctx.encrypt(pk, m, rng) for m in ms]
    out = ctx.dot_product(cts, ws, evk)
    want = np.zeros(N, dtype=object)
    for m, w in zip(ms, ws):
        want = (want + m.astype(object) * w) % T
    np.testing.assert_array_equal(ctx.decrypt(sk, out), want.astype(np.int64))
