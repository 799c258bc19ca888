"""CKKS tests: encode/decode, enc/dec, leveled ops, rescale, rotation,
conjugation -- precision-bounded assertions (the utckksrns analogue)."""

import numpy as np
import pytest

from fhe_tpu.pke import ckks, rlwe
from fhe_tpu.lattice import rns

N = 256
SLOTS = N // 2


@pytest.fixture(scope="module")
def ctx():
    return ckks.CkksContext.create(N=N, num_levels=4, scale_bits=26, dnum=2)


@pytest.fixture(scope="module")
def keys(ctx):
    rng = np.random.default_rng(11)
    sk, pk = ctx.keygen(rng)
    evk = ctx.relin_key_gen(sk, rng)
    return sk, pk, evk, rng


def test_encode_decode_roundtrip(rng):
    z = rng.normal(size=SLOTS) + 1j * rng.normal(size=SLOTS)
    m = ckks.encode(z, N, 2.0 ** 26)
    back = ckks.decode(m, N, 2.0 ** 26)
    np.testing.assert_allclose(back, z, atol=1e-5)


def test_encrypt_decrypt(ctx, keys, rng):
    sk, pk, _, _ = keys
    z = rng.normal(size=SLOTS)
    ct = ctx.encrypt(pk, z, rng)
    got = ctx.decrypt(sk, ct)
    np.testing.assert_allclose(got.real, z, atol=1e-4)
    assert np.abs(got.imag).max() < 1e-4


def test_add_sub(ctx, keys, rng):
    sk, pk, _, _ = keys
    z1 = rng.normal(size=SLOTS)
    z2 = rng.normal(size=SLOTS)
    ct1 = ctx.encrypt(pk, z1, rng)
    ct2 = ctx.encrypt(pk, z2, rng)
    np.testing.assert_allclose(ctx.decrypt(sk, ctx.add(ct1, ct2)).real,
                               z1 + z2, atol=1e-4)
    np.testing.assert_allclose(ctx.decrypt(sk, ctx.sub(ct1, ct2)).real,
                               z1 - z2, atol=1e-4)
    np.testing.assert_allclose(ctx.decrypt(sk, ctx.add_plain(ct1, z2)).real,
                               z1 + z2, atol=1e-4)


def test_mul_relin_rescale(ctx, keys, rng):
    sk, pk, evk, _ = keys
    z1 = rng.normal(size=SLOTS) * 0.5
    z2 = rng.normal(size=SLOTS) * 0.5
    ct1 = ctx.encrypt(pk, z1, rng)
    ct2 = ctx.encrypt(pk, z2, rng)
    prod = ctx.mul(ct1, ct2, evk)
    assert prod.c2 is None
    got = ctx.decrypt(sk, prod)
    np.testing.assert_allclose(got.real, z1 * z2, atol=1e-3)
    # rescale drops a limb and renormalizes the scale
    rs = ctx.rescale(prod)
    assert rs.level_limbs == prod.level_limbs - 1
    got2 = ctx.decrypt(sk, rs)
    np.testing.assert_allclose(got2.real, z1 * z2, atol=1e-3)


def test_mul_no_relin_decrypts(ctx, keys, rng):
    sk, pk, _, _ = keys
    z1 = rng.normal(size=SLOTS) * 0.5
    z2 = rng.normal(size=SLOTS) * 0.5
    ct1 = ctx.encrypt(pk, z1, rng)
    ct2 = ctx.encrypt(pk, z2, rng)
    prod = ctx.mul(ct1, ct2)          # keeps degree-2 component
    got = ctx.decrypt(sk, prod)
    np.testing.assert_allclose(got.real, z1 * z2, atol=1e-3)


def test_mul_depth2(ctx, keys, rng):
    sk, pk, evk, _ = keys
    z = rng.normal(size=SLOTS) * 0.5
    ct = ctx.encrypt(pk, z, rng)
    sq = ctx.rescale(ctx.mul(ct, ct, evk))
    sq2 = ctx.rescale(ctx.mul(sq, sq, evk))
    got = ctx.decrypt(sk, sq2)
    np.testing.assert_allclose(got.real, z ** 4, atol=5e-2)


def test_mul_plain(ctx, keys, rng):
    sk, pk, _, _ = keys
    z1 = rng.normal(size=SLOTS)
    z2 = rng.normal(size=SLOTS)
    ct = ctx.encrypt(pk, z1, rng)
    got = ctx.decrypt(sk, ctx.rescale(ctx.mul_plain(ct, z2)))
    np.testing.assert_allclose(got.real, z1 * z2, atol=1e-3)


def test_rotation(ctx, keys, rng):
    sk, pk, _, _ = keys
    rot_keys = ctx.rotation_key_gen(sk, [1, 2, SLOTS - 1], rng)
    z = rng.normal(size=SLOTS)
    ct = ctx.encrypt(pk, z, rng)
    for r in (1, 2, SLOTS - 1):
        got = ctx.decrypt(sk, ctx.rotate(ct, r, rot_keys))
        want = np.roll(z, -r)   # EvalRotate(+r) = left rotation
        np.testing.assert_allclose(got.real, want, atol=1e-3,
                                   err_msg=f"rot {r}")


def test_conjugate(ctx, keys, rng):
    sk, pk, _, _ = keys
    ck = ctx.conj_key_gen(sk, rng)
    z = rng.normal(size=SLOTS) + 1j * rng.normal(size=SLOTS)
    ct = ctx.encrypt(pk, z, rng)
    got = ctx.decrypt(sk, ctx.conjugate(ct, ck))
    np.testing.assert_allclose(got, np.conj(z), atol=1e-3)


def test_degree3_mult_keys_relinearize(rng):
    """EvalMultKeysGen + EvalMultNoRelin chain to degree 3 +
    EvalMultAndRelinearize (cryptocontext.h:1099,2050): a cubic product
    carried as a 4-component ciphertext relinearizes back to degree 1
    with the s^2/s^3 keys and decrypts to z1*z2*z3."""
    ctx = ckks.CkksContext.create(N=N, num_levels=4, scale_bits=18,
                                  dnum=2, first_bits=30)
    sk, pk = ctx.keygen(rng)
    evks = ctx.relin_keys_gen(sk, rng, max_degree=3)
    zs = [rng.normal(size=N // 2) * 0.8 for _ in range(3)]
    cts = [ctx.encrypt(pk, z, rng) for z in zs]

    deg2 = ctx.mul_no_relin(cts[0], cts[1])
    assert deg2.c2 is not None and not deg2.c_rest
    # decrypt of the un-relinearized degree-2 ciphertext works directly
    got2 = ctx.decrypt(sk, deg2)
    np.testing.assert_allclose(got2.real, zs[0] * zs[1], atol=5e-2)

    deg3 = ctx.mul_no_relin(deg2, cts[2])
    assert len(deg3.components()) == 4
    got3 = ctx.decrypt(sk, deg3)
    np.testing.assert_allclose(got3.real, zs[0] * zs[1] * zs[2], atol=0.3)

    lin = ctx.relinearize(deg3, evks)
    assert lin.c2 is None and not lin.c_rest
    got = ctx.decrypt(sk, lin)
    np.testing.assert_allclose(got.real, zs[0] * zs[1] * zs[2], atol=0.3)

    # mul_and_relinearize = the fused form
    fused = ctx.mul_and_relinearize(deg2, cts[2], evks)
    gotf = ctx.decrypt(sk, fused)
    np.testing.assert_allclose(gotf.real, zs[0] * zs[1] * zs[2], atol=0.3)


def test_fast_rotation_ext_keyswitch_down(rng):
    """EvalFastRotationExt + KeySwitchDown (cryptocontext.h:2437): a sum
    of extended rotations ModDown'd ONCE must match the sum of ordinary
    fast rotations (within key-switch noise)."""
    ctx = ckks.CkksContext.create(N=N, num_levels=4, scale_bits=28, dnum=2)
    sk, pk = ctx.keygen(rng)
    rots = [1, 2, 3]
    rk = ctx.rotation_key_gen(sk, rots, rng)
    z = rng.normal(size=N // 2)
    ct = ctx.encrypt(pk, z, rng)
    pre = ctx.fast_rotation_precompute(ct)

    acc = None
    for r in rots:
        ext = ctx.fast_rotation_ext(ct, r, rk, pre, add_first=True)
        acc = ext if acc is None else ctx.add(acc, ext)
    got_ext = ctx.decrypt(sk, ctx.key_switch_down(acc))

    want = sum(np.roll(z, -r) for r in rots)
    np.testing.assert_allclose(got_ext.real, want, atol=1e-3)

    # reference path: ordinary fast rotations summed over Q
    acc_q = None
    for r in rots:
        rot = ctx.fast_rotation(ct, r, rk, pre)
        acc_q = rot if acc_q is None else ctx.add(acc_q, rot)
    got_q = ctx.decrypt(sk, acc_q)
    np.testing.assert_allclose(got_ext.real, got_q.real, atol=1e-3)


def test_batched_ciphertext_mul_relin_rescale(ctx, keys, rng):
    """Leading batch dims through the fused HYBRID key switch: batched
    results must be bit-identical to the single-ciphertext path (the
    batch-over-ciphertexts P2 axis of SURVEY SS2.7 applied to PKE)."""
    import jax.numpy as jnp
    sk, pk, evk, _ = keys
    z = rng.normal(size=SLOTS) * 0.5
    ct = ctx.encrypt(pk, z, rng)
    B = 3
    bat = lambda p: rns.RnsPoly(
        jnp.broadcast_to(p.data, (B,) + p.data.shape), p.moduli, p.fmt)
    ctb = ckks.Ciphertext(bat(ct.c0), bat(ct.c1), ct.scale)
    outb = ctx.rescale(ctx.mul(ctb, ctb, evk))
    outs = ctx.rescale(ctx.mul(ct, ct, evk))
    for i in range(B):
        np.testing.assert_array_equal(np.asarray(outb.c0.data[i]),
                                      np.asarray(outs.c0.data))
        np.testing.assert_array_equal(np.asarray(outb.c1.data[i]),
                                      np.asarray(outs.c1.data))
    one = ckks.Ciphertext(
        rns.RnsPoly(outb.c0.data[1], outs.c0.moduli, outs.c0.fmt),
        rns.RnsPoly(outb.c1.data[1], outs.c1.moduli, outs.c1.fmt),
        outb.scale)
    got = ctx.decrypt(sk, one)
    np.testing.assert_allclose(got.real, z * z, atol=1e-3)


def test_mul_rescale_fused(ctx, keys, rng):
    """Fused mult+relin+rescale (key_switch_core extra/drop_q path) agrees
    with the separate mul-then-rescale pipeline within noise bounds."""
    sk, pk, evk, _ = keys
    z1 = rng.normal(size=SLOTS) * 0.5
    z2 = rng.normal(size=SLOTS) * 0.5
    ct1 = ctx.encrypt(pk, z1, rng)
    ct2 = ctx.encrypt(pk, z2, rng)
    fused = ctx.mul_rescale(ct1, ct2, evk)
    assert fused.level_limbs == ct1.level_limbs - ctx.cd
    got = ctx.decrypt(sk, fused)
    np.testing.assert_allclose(got.real, z1 * z2, atol=1e-3)
    # BIT-identical to the unfused mul-then-rescale pipeline: the fused
    # drop uses the exact basis switch, so both compute the same
    # floor(t / (P * q_block)) (and the same scale)
    ref = ctx.rescale(ctx.mul(ct1, ct2, evk))
    assert abs(fused.scale - ref.scale) < 1e-6 * ref.scale
    np.testing.assert_array_equal(np.asarray(fused.c0.data),
                                  np.asarray(ref.c0.data))
    np.testing.assert_array_equal(np.asarray(fused.c1.data),
                                  np.asarray(ref.c1.data))
    # square fast path (a is b)
    sq = ctx.mul_rescale(ct1, ct1, evk)
    got2 = ctx.decrypt(sk, sq)
    np.testing.assert_allclose(got2.real, z1 * z1, atol=1e-3)


def test_prepared_evk_matches_plain(ctx, keys, rng):
    """PreparedEvalKey (Montgomery-form key stacks) is bit-identical to
    the plain EvalKey path through the fused key switch."""
    sk, pk, evk, _ = keys
    pevk = rlwe.prepare_evk(ctx.params, evk)
    z = rng.normal(size=SLOTS) * 0.5
    ct = ctx.encrypt(pk, z, rng)
    a = ctx.mul_rescale(ct, ct, evk)
    b = ctx.mul_rescale(ct, ct, pevk)
    np.testing.assert_array_equal(np.asarray(a.c0.data),
                                  np.asarray(b.c0.data))
    np.testing.assert_array_equal(np.asarray(a.c1.data),
                                  np.asarray(b.c1.data))
    got = ctx.decrypt(sk, b)
    np.testing.assert_allclose(got.real, z * z, atol=1e-3)


def test_mod_down_eval_matches_coeff_roundtrip(ctx, keys, rng):
    """EVAL-domain ApproxModDown == the COEFF round-trip ModDown up to the
    shared approximate-conversion slack (identical constants => identical
    values)."""
    p = ctx.params
    q_mods = tuple(p.moduli)
    p_mods = tuple(p.special_mods)
    ext = q_mods + p_mods
    data = np.stack([rng.integers(0, q, size=N, dtype=np.int64)
                     for q in ext]).astype(np.uint32)
    t = rns.RnsPoly(rns.to_eval(rns.RnsPoly(
        np.asarray(data), ext, rns.COEFF)).data, ext, rns.EVAL)
    a = rlwe.mod_down_eval(p, t)
    b = rns.to_eval(rns.approx_mod_down(rns.to_coeff(t), q_mods, p_mods))
    np.testing.assert_array_equal(np.asarray(a.data), np.asarray(b.data))
