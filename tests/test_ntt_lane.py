"""Lane-factored NTT (math/ntt_lane.py) + blind-rotate megakernel v2
(tfhe/boot_mxu.py): bit-exactness vs the butterfly/unfused anchors
(the reference's byte-equality GPU-parity method, UnitTestMLX.cpp:40-116).
Pallas runs in interpret mode on the CPU test mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fhe_tpu.math import ntt as nttmod, ntt_lane as nl, primes
from fhe_tpu.tfhe import params as tp, boot, rgsw, boot_mxu


@pytest.mark.parametrize("N", [256, 512, 1024, 2048])
def test_lane_ntt_bitexact(rng, N):
    q = primes.prev_prime_congruent((1 << 27) - 1, 2 * N)
    plan = nttmod.make_plan(N, q)
    lp = nl.make_lane_plan(N, q)
    x = jnp.asarray(rng.integers(0, q, size=(3, N), dtype=np.int64)
                    .astype(np.uint32))
    want = nttmod.forward_butterfly(plan, x)
    got = nl.blocked_to_eval(nl.forward_lane(
        lp, nl.coeff_to_interleaved(x, lp.n1)))
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))

    wanti = nttmod.inverse_butterfly(plan, want)
    goti = nl.interleaved_to_coeff(nl.inverse_lane(
        lp, nl.eval_to_blocked(want, lp.n1)))
    np.testing.assert_array_equal(np.asarray(wanti), np.asarray(goti))


def test_lane_ntt_signed_digits(rng):
    N, q = 1024, 134215681
    plan = nttmod.make_plan(N, q)
    lp = nl.make_lane_plan(N, q)
    d = rng.integers(-256, 257, size=(3, N)).astype(np.int32)
    du = jnp.asarray(np.where(d < 0, d + q, d).astype(np.uint32))
    want = nttmod.forward_butterfly(plan, du)
    lo = ((d + 64) & 127) - 64
    hi = (d - lo) >> 7
    got = nl.blocked_to_eval(nl.forward_lane_digits(
        lp,
        nl.coeff_to_interleaved(jnp.asarray(lo.astype(np.int8)), lp.n1),
        nl.coeff_to_interleaved(jnp.asarray(hi.astype(np.int8)), lp.n1)))
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_mega2_blind_rotate_bitexact(rng):
    """Megakernel v2 (interpret mode) vs the unfused scan, random key."""
    params = tp.make_params("TOY")
    N, Q = params.N, params.Q
    B, nsteps = 16, 6
    acc = jnp.asarray(rng.integers(0, Q, size=(B, 2, N)).astype(np.uint32))
    bsk = jnp.asarray(rng.integers(
        0, Q, size=(nsteps, 2, params.digits_g2, 2, N)).astype(np.uint32))
    bsk_s = rgsw.shoup_dual(bsk, Q)
    a = jnp.asarray(rng.integers(0, params.q, size=(B, nsteps))
                    .astype(np.uint32))
    plan = nttmod.make_plan(N, Q)
    want = boot.blind_rotate(params, bsk, acc, a, "butterfly", None, plan,
                             None, bsk_shoup=bsk_s)
    got = boot_mxu.blind_rotate_mega2(params, bsk, bsk_s, acc, a, tile=8)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


@pytest.mark.slow
def test_mega2_gate_end_to_end(rng):
    """Full TOY AND gate through impl='mega2' decrypts correctly."""
    from fhe_tpu.tfhe import BinFheContext, Gate
    ctx = BinFheContext.generate("TOY")
    sk = ctx.key_gen(rng)
    key = ctx.bt_key_gen(sk, rng)
    B = 8
    m1 = rng.integers(0, 2, size=B)
    m2 = rng.integers(0, 2, size=B)
    ct1 = ctx.encrypt(sk, m1, rng)
    ct2 = ctx.encrypt(sk, m2, rng)
    out = boot.eval_bin_gate(ctx.params, key, Gate.AND, ct1, ct2,
                             ntt_impl="mega2")
    got = np.asarray(ctx.decrypt(sk, out, p=4))
    np.testing.assert_array_equal(got, m1 & m2)


# ---------------------------------------------------------------------------
# stacked-limb RNS lane NTT (the PKE hot path) + generic d=5 recombine
# ---------------------------------------------------------------------------

def test_lane_ntt_31bit_prime(rng):
    """d=5 generic recombination: 31-bit primes (PKE limb width)."""
    N = 2048
    q = primes.prev_prime_congruent((1 << 31) - 1, 2 * N)
    plan = nttmod.make_plan(N, q)
    lp = nl.make_lane_plan(N, q)
    assert lp.d == 5
    x = jnp.asarray(rng.integers(0, q, size=(2, N), dtype=np.int64)
                    .astype(np.uint32))
    want = nttmod.forward_butterfly(plan, x)
    got = nl.blocked_to_eval(nl.forward_lane(
        lp, nl.coeff_to_interleaved(x, lp.n1)))
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
    back = nl.interleaved_to_coeff(nl.inverse_lane(
        lp, nl.eval_to_blocked(got, lp.n1)))
    np.testing.assert_array_equal(np.asarray(x), np.asarray(back))


@pytest.mark.parametrize("N", [512, 4096])
def test_stack_lane_ntt_bitexact(rng, N):
    """Stacked-limb lane NTT vs the RNS butterfly anchor, mixed digit
    counts (31-bit + 28-bit limbs -> padded top planes)."""
    from fhe_tpu.lattice import rns
    mods = []
    q = (1 << 31) - 1
    while len(mods) < 3:
        q = primes.prev_prime_congruent(q - 1, 2 * N)
        mods.append(q)
    mods.append(primes.prev_prime_congruent((1 << 28) - 1, 2 * N))
    mods = tuple(mods)
    sp = nl.make_stack_plan(N, mods)
    rp = rns.make_rns_plan(N, mods)
    x = np.stack([rng.integers(0, q, size=N, dtype=np.int64)
                  .astype(np.uint32) for q in mods])
    xb = jnp.asarray(np.broadcast_to(x, (2,) + x.shape))
    want = rns.ntt_forward(rp, xb, impl="butterfly")
    got = rns.ntt_forward(rp, xb, impl="lane")
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
    back = rns.ntt_inverse(rp, got, impl="lane")
    np.testing.assert_array_equal(np.asarray(xb), np.asarray(back))


def test_stack_lane_negacyclic_product(rng):
    """Whole negacyclic product through the lane path equals butterfly."""
    from fhe_tpu.lattice import rns
    N = 1024
    mods = (primes.prev_prime_congruent((1 << 31) - 1, 2 * N),
            primes.prev_prime_congruent((1 << 30) - 1, 2 * N))
    rp = rns.make_rns_plan(N, mods)
    a = jnp.asarray(np.stack([rng.integers(0, q, size=N, dtype=np.int64)
                              .astype(np.uint32) for q in mods]))
    b = jnp.asarray(np.stack([rng.integers(0, q, size=N, dtype=np.int64)
                              .astype(np.uint32) for q in mods]))
    out = {}
    for impl in ("butterfly", "lane"):
        ea = rns.ntt_forward(rp, a, impl=impl)
        eb = rns.ntt_forward(rp, b, impl=impl)
        prod = rns.mul(rns.RnsPoly(ea, mods, rns.EVAL),
                       rns.RnsPoly(eb, mods, rns.EVAL))
        out[impl] = np.asarray(rns.ntt_inverse(rp, prod.data, impl=impl))
    np.testing.assert_array_equal(out["butterfly"], out["lane"])
