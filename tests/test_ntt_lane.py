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
