"""Serialization round-trips for every key/ciphertext type (the
UnitTestSerialize / boolean-serial-{binary,json} analogue)."""

import numpy as np
import pytest

from fhe_tpu.utils import serial
from fhe_tpu.tfhe import BinFheContext, Gate, lwe
from fhe_tpu.pke import ckks


def _eq_tree(a, b):
    import jax
    la, ta = jax.tree.flatten(a)
    lb, tb = jax.tree.flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("mode", ["binary", "json"])
def test_lwe_roundtrip(mode, rng):
    ctx = BinFheContext.generate("TOY")
    sk = ctx.key_gen(rng)
    ct = ctx.encrypt(sk, np.array([1, 0, 3, 2]), rng)
    blob = serial.dumps(ct, mode)
    back = serial.loads(blob, mode)
    _eq_tree(ct, back)
    assert back.modulus == ct.modulus and back.pt_mod == ct.pt_mod
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk, back)),
                                  np.asarray(ctx.decrypt(sk, ct)))


def test_bootstrap_key_roundtrip(rng):
    ctx = BinFheContext.generate("TOY")
    sk = ctx.key_gen(rng)
    key = ctx.bt_key_gen(sk, rng)
    blob = serial.dumps(key)
    back = serial.loads(blob)
    _eq_tree(key, back)
    # the deserialized key still evaluates gates correctly
    m1, m2 = np.array([1, 0]), np.array([1, 1])
    ct1, ct2 = ctx.encrypt(sk, m1, rng), ctx.encrypt(sk, m2, rng)
    out = ctx.eval_bin_gate(back, Gate.AND, ct1, ct2)
    np.testing.assert_array_equal(np.asarray(ctx.decrypt(sk, out, p=4)),
                                  m1 & m2)


def test_ckks_ct_and_keys_roundtrip(rng):
    ctx = ckks.CkksContext.create(N=128, num_levels=3, scale_bits=26, dnum=2)
    sk, pk = ctx.keygen(rng)
    evk = ctx.relin_key_gen(sk, rng)
    z = rng.normal(size=64)
    ct = ctx.encrypt(pk, z, rng)
    for obj in (sk, pk, evk, ct):
        back = serial.loads(serial.dumps(obj))
        _eq_tree(obj, back)
    ct2 = serial.loads(serial.dumps(ct))
    np.testing.assert_allclose(ctx.decrypt(sk, ct2).real, z, atol=1e-3)


def test_file_roundtrip(tmp_path, rng):
    ctx = BinFheContext.generate("TOY")
    sk = ctx.key_gen(rng)
    p = str(tmp_path / "sk.fhe")
    serial.save(sk, p)
    back = serial.load(p)
    _eq_tree(sk, back)


def test_new_key_types_roundtrip(rng):
    """Serialization of the round-1 additions: threshold shares (bytes
    commitments), witness structures, and accumulator keys."""
    from fhe_tpu.utils import serial
    from fhe_tpu.tfhe import threshold as th
    cfg = th.ThresholdConfig(threshold=2, total_parties=2,
                             scheme="additive")
    shares, vks = th.generate_key_shares(
        rng.integers(-1, 2, size=32), 512, cfg)
    blob = serial.dumps(shares[0])
    back = serial.loads(blob)
    np.testing.assert_array_equal(back.share, shares[0].share)
    assert back.commitment == shares[0].commitment
    jblob = serial.dumps(vks, mode="json")
    back2 = serial.loads(jblob, mode="json")
    assert back2[1].party_id == vks[1].party_id
    assert back2[1].commitment == vks[1].commitment


def test_eval_key_cache_roundtrip(rng):
    """Per-keyTag eval-key caches + Serialize/DeserializeEvalMultKey /
    AutomorphismKey (cryptocontext.h:643-800)."""
    from fhe_tpu.pke import keycache
    ctx = ckks.CkksContext.create(N=128, num_levels=3, scale_bits=26, dnum=2)
    sk, pk = ctx.keygen(rng)
    evk = ctx.relin_key_gen(sk, rng)
    rot = ctx.rotation_key_gen(sk, [1, -1], rng)
    keycache.clear_eval_mult_keys()
    keycache.clear_eval_automorphism_keys()
    keycache.insert_eval_mult_key(evk, "alice")
    keycache.insert_eval_automorphism_key(rot, "alice")
    assert keycache.get_existing_eval_automorphism_key_indices("alice") \
        == [-1, 1]
    blob = keycache.serialize_eval_mult_key("alice")
    ablob = keycache.serialize_eval_automorphism_key("alice")
    keycache.clear_eval_mult_keys("alice")
    keycache.clear_eval_automorphism_keys("alice")
    assert keycache.get_all_eval_mult_keys() == {}
    assert keycache.deserialize_eval_mult_key(blob) == ["alice"]
    assert keycache.deserialize_eval_automorphism_key(ablob) == ["alice"]
    # restored keys still work: mult+relin and a rotation
    z = rng.normal(size=64)
    ct = ctx.encrypt(pk, z, rng)
    evk2 = keycache.get_eval_mult_key("alice")
    out = ctx.rescale(ctx.mul(ct, ct, evk2))
    np.testing.assert_allclose(ctx.decrypt(sk, out).real, z * z, atol=1e-2)
    rot2 = keycache.get_eval_automorphism_key("alice")
    rctx = ctx.rotate(ct, 1, rot2)
    np.testing.assert_allclose(ctx.decrypt(sk, rctx).real, np.roll(z, -1),
                               atol=1e-3)
