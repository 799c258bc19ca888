"""On-device parity subset: the framework's analogue of the reference's
suites-under-MLX method (/root/reference/src/core/unittest/
UnitTestMLX.cpp:22-24,40-116 -- same tests on the accelerator build,
byte-equality vs the CPU path).

Run on the real chip with:  FHE_TEST_TPU=1 python -m pytest -m tpu tests/
Skipped (not failed) everywhere else.  All assertions are BIT-equality
between independent implementations (butterfly vs lane vs Pallas NTT,
eager XLA vs megakernel blind rotate, plain vs Montgomery-prepared keys),
plus end-to-end decrypt checks, executed on whatever backend JAX
resolves -- on the TPU these exercise the MXU/Pallas code paths the CPU
suite never compiles.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def device_rng():
    return np.random.default_rng(777)


@pytest.fixture(scope="module")
def std128(device_rng):
    """One STD128 context + bootstrap key shared by the device subset
    (BT keygen is the expensive part)."""
    from fhe_tpu.tfhe import BinFheContext

    ctx = BinFheContext.generate("STD128")
    sk = ctx.key_gen(device_rng)
    key = ctx.bt_key_gen(sk, device_rng)
    return ctx, sk, key


def test_backend_is_real_device():
    # informational: records which backend actually ran this subset
    assert jax.default_backend() in ("tpu", "cpu")


@pytest.mark.parametrize("N", [2048, 1 << 14])
def test_ntt_lane_vs_butterfly_bitexact(device_rng, N):
    """Stacked-limb lane NTT == butterfly NTT, byte-equality, fwd+inv."""
    from fhe_tpu.lattice import rns
    from fhe_tpu.math import primes

    mods = tuple(primes.generate_ntt_primes(30, 2 * N, 3))
    plan = rns.make_rns_plan(N, mods)
    x = jnp.asarray(np.stack(
        [device_rng.integers(0, q, size=N, dtype=np.int64) for q in mods]
    ).astype(np.uint32))
    fwd = lambda impl: jax.jit(
        lambda v: rns.ntt_forward(plan, v, impl=impl))
    inv = lambda impl: jax.jit(
        lambda v: rns.ntt_inverse(plan, v, impl=impl))
    f_lane = np.asarray(fwd("lane")(x))
    f_bfly = np.asarray(fwd("butterfly")(x))
    np.testing.assert_array_equal(f_lane, f_bfly)
    i_lane = np.asarray(inv("lane")(jnp.asarray(f_lane)))
    i_bfly = np.asarray(inv("butterfly")(jnp.asarray(f_lane)))
    np.testing.assert_array_equal(i_lane, i_bfly)
    np.testing.assert_array_equal(i_lane, np.asarray(x))


def test_single_mod_ntt_impl_matrix(device_rng):
    """forward/inverse agree across butterfly, mxu-dense, and lane
    single-modulus implementations at the TFHE ring size."""
    from fhe_tpu.math import ntt as nttmod
    from fhe_tpu.tfhe import params as tp

    p = tp.make_params("STD128")
    plan = nttmod.make_plan(p.N, p.Q)
    x = jnp.asarray(device_rng.integers(0, p.Q, size=(4, p.N),
                                        dtype=np.int64).astype(np.uint32))
    ref = np.asarray(jax.jit(
        lambda v: nttmod.ntt_forward(plan, v, "butterfly"))(x))
    mxu = nttmod.make_mxu(p.N, p.Q)
    for impl in ("mxu", "lane"):
        mx = mxu if impl == "mxu" else None
        got = np.asarray(jax.jit(
            lambda v, i=impl, m=mx: nttmod.ntt_forward(plan, v, i, m))(x))
        np.testing.assert_array_equal(got, ref, err_msg=impl)
        back = np.asarray(jax.jit(
            lambda v, i=impl, m=mx: nttmod.ntt_inverse(plan, v, i, m))(
            jnp.asarray(got)))
        np.testing.assert_array_equal(back, np.asarray(x), err_msg=impl)


def test_mega2_vs_eager_blind_rotate_bitexact(device_rng, std128):
    """The Pallas megakernel's whole-scan accumulator == the eager XLA
    blind rotate, byte-equality, on a real STD128 key."""
    from fhe_tpu.tfhe import Gate, boot

    ctx, sk, key = std128
    p = ctx.params
    B = 4
    a = jnp.asarray(device_rng.integers(0, p.q, size=(B, p.n),
                                        dtype=np.int64).astype(np.uint32))
    b = jnp.asarray(device_rng.integers(0, p.q, size=B,
                                        dtype=np.int64).astype(np.uint32))
    consts = jnp.asarray(boot.gate_constants(p, Gate.AND))
    tv = boot.make_gate_test_vector(p, b, consts)
    # jit both pipelines: the eager 503-step scan would otherwise
    # dispatch each op through the device tunnel individually
    mega = jax.jit(lambda t, aa: boot.bootstrap_core(p, key, t, aa,
                                                     ntt_impl="mega2"))
    eager = jax.jit(lambda t, aa: boot.bootstrap_core(p, key, t, aa,
                                                      ntt_impl="butterfly"))
    out_mega = np.asarray(mega(tv, a))
    out_eager = np.asarray(eager(tv, a))
    np.testing.assert_array_equal(out_mega, out_eager)


def test_std128_gate_truth_table_device(device_rng, std128):
    """End-to-end STD128 AND/OR/XOR truth tables through the default
    (megakernel) path on the device."""
    from fhe_tpu.tfhe import Gate

    ctx, sk, key = std128
    m1 = np.array([0, 0, 1, 1])
    m2 = np.array([0, 1, 0, 1])
    ct1 = ctx.encrypt(sk, m1, device_rng)
    ct2 = ctx.encrypt(sk, m2, device_rng)
    for gate, want in ((Gate.AND, m1 & m2), (Gate.OR, m1 | m2),
                      (Gate.XOR, m1 ^ m2)):
        out = ctx.eval_bin_gate(key, gate, ct1, ct2)
        got = np.asarray(ctx.decrypt(sk, out, p=4))
        np.testing.assert_array_equal(got, want, err_msg=str(gate))


def test_ckks_mul_rescale_device(device_rng):
    """CKKS fused mult+relin+rescale precision + prepared-key
    byte-equality at N=2^12 on the device."""
    from fhe_tpu.pke import ckks, rlwe

    N = 1 << 12
    ctx = ckks.CkksContext.create(N=N, num_levels=5, scale_bits=26, dnum=3)
    sk, pk = ctx.keygen(device_rng)
    evk = ctx.relin_key_gen(sk, device_rng)
    pevk = rlwe.prepare_evk(ctx.params, evk)
    z = device_rng.normal(size=N // 2) * 0.5
    ct = ctx.encrypt(pk, z, device_rng)
    out_plain = ctx.mul_rescale(ct, ct, evk)
    out_prep = ctx.mul_rescale(ct, ct, pevk)
    np.testing.assert_array_equal(np.asarray(out_plain.c0.data),
                                  np.asarray(out_prep.c0.data))
    np.testing.assert_array_equal(np.asarray(out_plain.c1.data),
                                  np.asarray(out_prep.c1.data))
    got = ctx.decrypt(sk, out_prep).real
    # decoded slot noise scales ~sqrt(N)/scale: at N=2^12, scale 2^26 the
    # post-mult+rescale error reaches ~1.4e-3 on a handful of slots
    # (measured; the N=256 CPU variant sits well under 1e-3)
    np.testing.assert_allclose(got, z * z, atol=5e-3)


def test_bfv_mult_device(device_rng):
    """BFV exact multiply decrypts exactly on the device."""
    from fhe_tpu.pke import bfv

    N = 1 << 12
    ctx = bfv.BfvContext.create(N=N, num_limbs=3, plain_mod=65537, dnum=3)
    sk, pk = ctx.keygen(device_rng)
    evk = ctx.relin_key_gen(sk, device_rng)
    m = device_rng.integers(0, 100, size=N)
    c = ctx.encrypt(pk, m, device_rng)
    got = ctx.decrypt(sk, ctx.mul(c, c, evk))
    np.testing.assert_array_equal(got, (m * m) % 65537)
