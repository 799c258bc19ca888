"""Scheme switching tests (ckksrns-schemeswitching.cpp analogue):
CKKS -> FHEW extraction + key switch, FHEW -> CKKS sine interpolation,
sign/compare composition."""

import numpy as np
import pytest

import jax.numpy as jnp

from fhe_tpu.pke import ckks, schemeswitch as ss
from fhe_tpu.tfhe import BinFheContext, lwe as tlwe

N = 128
SLOTS = N // 2


@pytest.fixture(scope="module")
def setup():
    ctx = ckks.CkksContext.create(N=N, num_levels=15, scale_bits=26,
                                  dnum=2)
    rng = np.random.default_rng(21)
    sk, pk = ctx.keygen(rng)
    evk = ctx.relin_key_gen(sk, rng)
    tctx = BinFheContext.generate("TOY")
    tsk = tctx.key_gen(rng)
    return ctx, sk, pk, evk, tctx, tsk, rng


def test_ckks_to_fhew_ring_extraction(setup):
    ctx, sk, pk, evk, tctx, tsk, rng = setup
    key = ss.ckks_to_fhew_setup(ctx, sk, None, None, rng)
    z = rng.integers(0, 4, size=SLOTS).astype(np.float64)
    ct = ctx.encrypt(pk, z, rng)
    cts = ss.eval_ckks_to_fhew(ctx, key, ct, p=4)
    ring_sk = tlwe.LweSecretKey(s=jnp.asarray(
        np.asarray(sk.s_signed, dtype=np.int32)))
    got = np.asarray(tlwe.decrypt(tctx.params, ring_sk, cts, p=4))
    np.testing.assert_array_equal(got, z.astype(int))


def test_ckks_to_fhew_full(setup):
    ctx, sk, pk, evk, tctx, tsk, rng = setup
    key = ss.ckks_to_fhew_setup(ctx, sk, tctx.params, tsk, rng)
    z = rng.integers(0, 4, size=SLOTS).astype(np.float64)
    ct = ctx.encrypt(pk, z, rng)
    cts = ss.eval_ckks_to_fhew(ctx, key, ct, p=4,
                               fhew_params=tctx.params)
    got = np.asarray(tctx.decrypt(tsk, cts, p=4))
    np.testing.assert_array_equal(got, z.astype(int))


@pytest.mark.slow
def test_fhew_to_ckks_bits(setup):
    ctx, sk, pk, evk, tctx, tsk, rng = setup
    k2 = ss.fhew_to_ckks_setup(ctx, sk, tsk, pk, rng)
    m = rng.integers(0, 2, size=32)
    cts = tctx.encrypt(tsk, m, rng)
    out = ss.eval_fhew_to_ckks(ctx, k2, cts, evk)
    got = ctx.decrypt(sk, out).real[:32]
    assert np.abs(got - m).max() < 0.3
    np.testing.assert_array_equal(np.rint(got).astype(int), m)


@pytest.mark.slow
def test_fhew_to_ckks_pary(setup):
    """p > 4: the reference's p-ary contract (ckksrns-schemeswitching.cpp
    :1663-1676) -- output ~ (p/2pi)*sin(2*pi*m/p), exact at m=0 and
    sinc-attenuated further out."""
    ctx, sk, pk, evk, tctx, tsk, rng = setup
    p = 8
    m = rng.integers(0, 2, size=32)       # small messages vs p
    cts = tctx.encrypt(tsk, m, rng, p=p)
    k2 = ss.fhew_to_ckks_setup(ctx, sk, tsk, pk, rng)
    out = ss.eval_fhew_to_ckks(ctx, k2, cts, evk, p=p)
    got = ctx.decrypt(sk, out).real[:32]
    want = (p / (2 * np.pi)) * np.sin(2 * np.pi * m / p)
    # toy-parameter noise floor ~0.15 (message spacing here is ~0.9)
    assert np.abs(got - want).max() < 0.2


@pytest.mark.slow
def test_compare_scheme_switching(setup):
    """EvalCompareSchemeSwitching: sign(ct1 - ct2) via FHEW sign
    bootstraps (1 iff ct1 < ct2 per the difference-sign convention).
    Uses TOY_RADIX (q=4096, qKS=2^17) so EvalSign's flooring ladder is
    short."""
    ctx, sk, pk, evk, _tctx, _tsk, rng = setup
    tctx = BinFheContext.generate("TOY_RADIX")
    tsk = tctx.key_gen(rng)
    key = ss.ckks_to_fhew_setup(ctx, sk, tctx.params, tsk, rng)
    tkey = tctx.bt_key_gen(tsk, rng)
    # strictly unequal pairs: equality (diff = 0) sits exactly on the
    # sign boundary and flips with the extraction noise (the reference's
    # comparison has the same epsilon-band caveat)
    z1 = np.zeros(SLOTS); z2 = np.zeros(SLOTS)
    z1[:4] = [1.0, 3.0, 2.0, 0.0]
    z2[:4] = [2.0, 1.0, 4.0, 3.0]
    ct1 = ctx.encrypt(pk, z1, rng)
    ct2 = ctx.encrypt(pk, z2, rng)
    out = ss.eval_compare_scheme_switching(ctx, key, ct1, ct2, tctx, tkey,
                                           num_values=4)
    a = out.a[:4]
    out4 = type(out)(a=a, b=out.b[:4], modulus=out.modulus, pt_mod=2)
    got = np.asarray(tctx.decrypt(tsk, out4, p=2))
    want = (z1[:4] < z2[:4]).astype(int)
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_min_max_scheme_switching(setup):
    """EvalMin/MaxSchemeSwitching (ckksrns-schemeswitching.cpp:1930+):
    tournament select over FHEW sign bootstraps, min over 4 values with
    one-hot argmin, max over 2 values.

    Needs a deeper chain than the shared fixture: each FHEW->CKKS
    selector burns ~12 levels from fresh, and every tournament round
    costs the VALUE ciphertext one multiply BELOW the selector's level
    (the reference's towersToDrop=12 bookkeeping)."""
    _ctx, _sk, _pk, _evk, _tctx, _tsk, rng = setup
    ctx = ckks.CkksContext.create(N=N, num_levels=18, scale_bits=26,
                                  dnum=2)
    sk, pk = ctx.keygen(rng)
    evk = ctx.relin_key_gen(sk, rng)
    tctx = BinFheContext.generate("TOY_RADIX")
    tsk = tctx.key_gen(rng)
    tkey = tctx.bt_key_gen(tsk, rng)
    key = ss.ckks_to_fhew_setup(ctx, sk, tctx.params, tsk, rng)
    k2 = ss.fhew_to_ckks_setup(ctx, sk, tsk, pk, rng)
    rot = ctx.rotation_key_gen(sk, ss.min_max_rotation_indices(4), rng)

    z = np.zeros(SLOTS)
    z[:4] = [3.0, 1.0, 2.0, 4.0]
    ct = ctx.encrypt(pk, z, rng)
    mn, ind = ss.eval_min_scheme_switching(ctx, key, k2, ct, tctx, tkey,
                                           evk, rot, num_values=4)
    got_min = ctx.decrypt(sk, mn).real[0]
    assert abs(got_min - 1.0) < 0.2, got_min
    got_ind = ctx.decrypt(sk, ind).real[:4]
    assert np.argmax(got_ind) == 1 and got_ind[1] > 0.6, got_ind

    z2 = np.zeros(SLOTS)
    z2[:2] = [1.0, 3.0]
    ct2 = ctx.encrypt(pk, z2, rng)
    mx, _ = ss.eval_max_scheme_switching(ctx, key, k2, ct2, tctx, tkey,
                                         evk, rot, num_values=2)
    got_max = ctx.decrypt(sk, mx).real[0]
    assert abs(got_max - 3.0) < 0.2, got_max


@pytest.mark.slow
def test_min_max_scheme_switching_alt(setup):
    """EvalMin/MaxSchemeSwitchingAlt (ckksrns-schemeswitching.cpp:
    2013/2174): the full selector assembled in the FHEW domain
    (sign + q/2-negated duplicates), one FHEW->CKKS conversion per
    round, no CKKS mask-expansion rotations."""
    _ctx, _sk, _pk, _evk, _tctx, _tsk, rng = setup
    ctx = ckks.CkksContext.create(N=N, num_levels=18, scale_bits=26,
                                  dnum=2)
    sk, pk = ctx.keygen(rng)
    evk = ctx.relin_key_gen(sk, rng)
    tctx = BinFheContext.generate("TOY_RADIX")
    tsk = tctx.key_gen(rng)
    tkey = tctx.bt_key_gen(tsk, rng)
    key = ss.ckks_to_fhew_setup(ctx, sk, tctx.params, tsk, rng)
    k2 = ss.fhew_to_ckks_setup(ctx, sk, tsk, pk, rng)
    rot = ctx.rotation_key_gen(
        sk, ss.min_max_rotation_indices_alt(4), rng)

    z = np.zeros(SLOTS)
    z[:4] = [3.0, 1.0, 2.0, 4.0]
    ct = ctx.encrypt(pk, z, rng)
    mn, ind = ss.eval_min_scheme_switching_alt(
        ctx, key, k2, ct, tctx, tkey, evk, rot, num_values=4)
    got_min = ctx.decrypt(sk, mn).real[0]
    assert abs(got_min - 1.0) < 0.2, got_min
    got_ind = ctx.decrypt(sk, ind).real[:4]
    assert np.argmax(got_ind) == 1 and got_ind[1] > 0.6, got_ind

    z2 = np.zeros(SLOTS)
    z2[:2] = [1.0, 3.0]
    ct2 = ctx.encrypt(pk, z2, rng)
    mx, _ = ss.eval_max_scheme_switching_alt(
        ctx, key, k2, ct2, tctx, tkey, evk, rot, num_values=2)
    got_max = ctx.decrypt(sk, mx).real[0]
    assert abs(got_max - 3.0) < 0.2, got_max


def test_compare_switch_precompute():
    """EvalCompareSwitchPrecompute returns a key with the scale factor
    folded in; the original key is untouched (functional contract)."""
    base = ss.CkksToFhewKey(rot_keys={}, ksk=None, bsgs_g=1, slots=4)
    scaled = ss.eval_compare_switch_precompute(base, scale_sign=0.25)
    assert scaled.scale_cf == 0.25 and base.scale_cf == 1.0
