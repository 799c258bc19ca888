"""Multiparty threshold decryption tests (UnitTestMultiparty analogue):
all parties simulated in-process, like the reference's test strategy."""

import numpy as np
import pytest

from fhe_tpu.pke import ckks, bgv, multiparty, rlwe
from fhe_tpu.lattice import rns

N = 256


def test_ckks_3party(rng):
    ctx = ckks.CkksContext.create(N=N, num_levels=4, scale_bits=28, dnum=2)
    sks, pk = multiparty.multiparty_keygen(ctx.params, 3, rng)
    z = rng.normal(size=N // 2)
    ct = ctx.encrypt(pk, z, rng)
    lead = multiparty.decrypt_lead(ctx.params, sks[0], ct.c0, ct.c1, rng)
    mains = [multiparty.decrypt_main(ctx.params, sk, ct.c1, rng)
             for sk in sks[1:]]
    ph = multiparty.fuse([lead] + mains)
    big = rns.to_bigint(ph)
    Q = 1
    for q in ct.moduli:
        Q *= q
    m = ckks._center(big, Q)
    got = ckks.decode(m, N, ct.scale)
    # noise flooding (sd 2^20, MP_SD) vs 28-bit scale: per-slot error
    # ~ sd*sqrt(parties)*sqrt(N)/scale ~ 0.1 (the reference hides this
    # under 60-bit moduli; composite scaling will recover the headroom)
    np.testing.assert_allclose(got.real, z, atol=0.6)


def test_ckks_3party_after_mult(rng):
    ctx = ckks.CkksContext.create(N=N, num_levels=4, scale_bits=28, dnum=2)
    sks, pk = multiparty.multiparty_keygen(ctx.params, 3, rng)
    # relin key for the JOINT secret cannot be generated without interaction;
    # test the add-only homomorphism under the joint key instead
    z1 = rng.normal(size=N // 2)
    z2 = rng.normal(size=N // 2)
    ct1 = ctx.encrypt(pk, z1, rng)
    ct2 = ctx.encrypt(pk, z2, rng)
    cts = ctx.add(ct1, ct2)
    lead = multiparty.decrypt_lead(ctx.params, sks[0], cts.c0, cts.c1, rng)
    mains = [multiparty.decrypt_main(ctx.params, sk, cts.c1, rng)
             for sk in sks[1:]]
    ph = multiparty.fuse([lead] + mains)
    big = rns.to_bigint(ph)
    Q = 1
    for q in cts.moduli:
        Q *= q
    got = ckks.decode(ckks._center(big, Q), N, cts.scale)
    np.testing.assert_allclose(got.real, z1 + z2, atol=0.8)


def test_bgv_5party(rng):
    ctx = bgv.BgvContext.create(N=N, num_levels=2, plain_mod=65537,
                                mod_bits=28, dnum=2)
    sks, pk = multiparty.multiparty_keygen(ctx.params, 5, rng)
    m = rng.integers(0, 65537, size=N)
    ct = ctx.encrypt(pk, m, rng)
    lead = multiparty.decrypt_lead(ctx.params, sks[0], ct.c0, ct.c1, rng)
    mains = [multiparty.decrypt_main(ctx.params, sk, ct.c1, rng)
             for sk in sks[1:]]
    ph = multiparty.fuse([lead] + mains)
    big = rns.to_bigint(ph)
    Q = 1
    for q in ct.moduli:
        Q *= q
    t = 65537
    coeffs = np.array([(int(x) if int(x) <= Q // 2 else int(x) - Q) % t
                       for x in big], dtype=np.int64)
    got = bgv.decode(coeffs, t, N)
    np.testing.assert_array_equal(got, m % t)


def _threshold_decrypt(ctx, sks, ct, rng):
    lead = multiparty.decrypt_lead(ctx.params, sks[0], ct.c0, ct.c1, rng)
    mains = [multiparty.decrypt_main(ctx.params, sk, ct.c1, rng)
             for sk in sks[1:]]
    ph = multiparty.fuse([lead] + mains)
    big = rns.to_bigint(ph)
    Q = 1
    for q in ct.moduli:
        Q *= q
    return ckks.decode(ckks._center(big, Q), ctx.params.N, ct.scale)


def test_joint_relin_key(rng):
    """Threshold eval-key protocol (threshold-fhe.cpp rounds):
    MultiKeySwitchGen -> MultiAddEvalKeys -> MultiMultEvalKey x2 ->
    MultiAddEvalMultKeys gives a relin key for the JOINT secret; EvalMult
    + rescale must then decrypt correctly under threshold decryption."""
    ctx = ckks.CkksContext.create(N=N, num_levels=4, scale_bits=28, dnum=2)
    sks, pk = multiparty.multiparty_keygen(ctx.params, 2, rng)
    mods = tuple(ctx.params.moduli)
    s1 = sks[0].eval_poly(mods)
    s2 = sks[1].eval_poly(mods)
    evk1 = rlwe.evk_gen(ctx.params, s1, sks[0], rng)
    evk2 = multiparty.multi_key_switch_gen(ctx.params, s2, sks[1], evk1, rng)
    evk_ab = multiparty.multi_add_eval_keys(evk1, evk2)
    sh1 = multiparty.multi_mult_eval_key(ctx.params, evk_ab, sks[0], rng)
    sh2 = multiparty.multi_mult_eval_key(ctx.params, evk_ab, sks[1], rng)
    rlk = multiparty.multi_add_eval_mult_keys(sh1, sh2)

    z1 = rng.normal(size=N // 2) * 0.5
    z2 = rng.normal(size=N // 2) * 0.5
    ct1 = ctx.encrypt(pk, z1, rng)
    ct2 = ctx.encrypt(pk, z2, rng)
    prod = ctx.rescale(ctx.mul(ct1, ct2, rlk))
    got = _threshold_decrypt(ctx, sks, prod, rng)
    np.testing.assert_allclose(got.real, z1 * z2, atol=0.8)


def test_joint_rotation_key(rng):
    """MultiEvalAutomorphismKeyGen + MultiAddEvalAutomorphismKeys: joint
    rotation key; EvalRotate under the joint secret."""
    ctx = ckks.CkksContext.create(N=N, num_levels=4, scale_bits=28, dnum=2)
    sks, pk = multiparty.multiparty_keygen(ctx.params, 2, rng)
    mods = tuple(ctx.params.moduli)
    k = pow(5, 1, 2 * N)
    s1k = rns.automorphism(sks[0].eval_poly(mods), k)
    rk1 = {1: rlwe.evk_gen(ctx.params, s1k, sks[0], rng)}
    rk2 = multiparty.multi_eval_automorphism_key_gen(
        ctx.params, sks[1], rk1, {1: k}, rng)
    rkj = multiparty.multi_add_eval_automorphism_keys(rk1, rk2)

    z = rng.normal(size=N // 2)
    ct = ctx.encrypt(pk, z, rng)
    rot = ctx.rotate(ct, 1, rkj)
    got = _threshold_decrypt(ctx, sks, rot, rng)
    np.testing.assert_allclose(got.real, np.roll(z, -1), atol=0.8)


def test_int_boot_2party(rng):
    """2-party IntBoot* interactive bootstrap
    (interactive-bootstrapping.cpp:115-135): server share rnd(c0+c1*s1),
    client share rnd(c1*s2) re-encrypted at the full modulus, summed."""
    ctx = ckks.CkksContext.create(N=N, num_levels=6, scale_bits=26, dnum=2)
    sks, pk = multiparty.multiparty_keygen(ctx.params, 2, rng)
    z = rng.normal(size=N // 2) * 0.5
    ct = ctx.encrypt(pk, z, rng)
    low = multiparty.int_boot_adjust_scale(ctx, ct, extra_limbs=1)
    assert len(low.moduli) == 2

    h1 = multiparty.int_boot_decrypt(ctx.params, sks[0], low.c0, low.c1)
    h2 = multiparty.int_boot_decrypt(ctx.params, sks[1], low.c1)
    fresh = multiparty.int_boot_encrypt(ctx.params, pk, h2, low, rng)
    out = multiparty.int_boot_add(ctx.params, fresh, h1)
    assert len(out.moduli) == len(ctx.params.moduli)

    got = _threshold_decrypt(ctx, sks, out, rng)
    np.testing.assert_allclose(got.real, z, atol=1.2)


def test_interactive_mp_bootstrap(rng):
    """IntMPBoot*: 2-party interactive bootstrap of an exhausted CKKS
    ciphertext (interactive-bootstrapping.cpp pattern: all parties
    in-process)."""
    ctx = ckks.CkksContext.create(N=N, num_levels=6, scale_bits=26, dnum=2)
    sks, pk = multiparty.multiparty_keygen(ctx.params, 2, rng)
    z = rng.normal(size=N // 2) * 0.5
    ct = ctx.encrypt(pk, z, rng)
    low = multiparty.int_boot_adjust_scale(ctx, ct)
    # base block + 2 statistical-hiding limbs (masks range over Qc/(8n),
    # ~2^53 above the value bound -- the reference's R_{q*2^lambda})
    assert len(low.moduli) == ctx.cd + 2

    a = multiparty.int_mp_boot_random_gen(ctx.params, rng)
    shares = [multiparty.int_mp_boot_decrypt(ctx.params, sk, low, a, rng)
              for sk in sks]
    agg = multiparty.int_mp_boot_add(shares)
    fresh = multiparty.int_mp_boot_encrypt(ctx.params, low, agg, a)
    assert len(fresh.moduli) == len(ctx.params.moduli)   # full chain again

    # joint decrypt of the refreshed ciphertext
    lead = multiparty.decrypt_lead(ctx.params, sks[0], fresh.c0, fresh.c1,
                                   rng)
    mains = [multiparty.decrypt_main(ctx.params, sks[1], fresh.c1, rng)]
    ph = multiparty.fuse([lead] + mains)
    big = rns.to_bigint(ph)
    Q = 1
    for q in fresh.moduli:
        Q *= q
    m = ckks._center(big, Q)
    got = ckks.decode(m, N, fresh.scale)
    # error floor = the MP_SD=2^20 flooding noise of the final joint
    # decrypt at scale 2^26 (~0.6 across N slots), not the IntBoot itself
    np.testing.assert_allclose(got.real, z, atol=1.2)


def test_threshold_decrypt_pipeline(rng):
    """Whole-protocol single-jit pipeline matches the per-party API's
    result statistically (same decrypt within flooding tolerance)."""
    ctx = ckks.CkksContext.create(N=N, num_levels=4, scale_bits=28, dnum=2)
    sks, pk = multiparty.multiparty_keygen(ctx.params, 5, rng)
    z = rng.normal(size=N // 2)
    ct = ctx.encrypt(pk, z, rng)
    ph = multiparty.threshold_decrypt_pipeline(ctx.params, sks, ct.c0,
                                               ct.c1, rng)
    big = rns.to_bigint(ph)
    Q = 1
    for q in ct.moduli:
        Q *= q
    got = ckks.decode(ckks._center(big, Q), N, ct.scale)
    np.testing.assert_allclose(got.real, z, atol=0.8)
