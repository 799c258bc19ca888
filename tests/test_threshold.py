"""Batched threshold TFHE decryption tests (batch_threshold.h analogue):
additive n-of-n on gate ciphertexts (q = 2^k), Shamir t-of-n on
Q-extended ciphertexts (prime modulus), sigma-protocol verification,
Merkle/transcript helpers."""

import numpy as np
import pytest

from fhe_tpu.tfhe import BinFheContext, lwe
from fhe_tpu.tfhe import threshold as th
from fhe_tpu.tfhe.transcript import MerkleTree, TranscriptBuilder, DomainTag


@pytest.fixture(scope="module")
def toy():
    ctx = BinFheContext.generate("TOY")
    rng = np.random.default_rng(99)
    sk = ctx.key_gen(rng)
    m = rng.integers(0, 2, size=16)
    ct = ctx.encrypt(sk, m, rng)
    return ctx, sk, m, ct


def test_additive_3_of_3(toy):
    ctx, sk, m, ct = toy
    cfg = th.ThresholdConfig(threshold=3, total_parties=3,
                             scheme="additive")
    shares, vks = th.generate_key_shares(np.asarray(sk.s), ct.modulus, cfg)
    got = th.threshold_decrypt(cfg, ct, shares, vks, p=4)
    np.testing.assert_array_equal(got % 2, m)


def test_additive_missing_party_fails(toy):
    ctx, sk, m, ct = toy
    cfg = th.ThresholdConfig(threshold=3, total_parties=3,
                             scheme="additive", generate_proofs=False)
    shares, _ = th.generate_key_shares(np.asarray(sk.s), ct.modulus, cfg)
    pds = [th.batch_partial_decrypt(cfg, ct, s)[0] for s in shares[:2]]
    with pytest.raises(ValueError):
        th.batch_combine(cfg, ct, pds)


def test_proof_rejects_tampering(toy):
    ctx, sk, m, ct = toy
    cfg = th.ThresholdConfig(threshold=3, total_parties=3,
                             scheme="additive")
    shares, vks = th.generate_key_shares(np.asarray(sk.s), ct.modulus, cfg)
    pd, proof = th.batch_partial_decrypt(cfg, ct, shares[0])
    assert th.batch_verify_proofs(cfg, ct, pd, proof, vks[0])
    bad = th.BatchPartialDecryption(
        pd.party_id, (pd.values + 1) % ct.modulus, pd.batch_commitment)
    assert not th.batch_verify_proofs(cfg, ct, bad, proof, vks[0])


def test_shamir_2_of_3_extended(toy):
    """Shamir over the prime ring modulus Q via extended (pre-keyswitch)
    ciphertexts from the bootstrap pipeline."""
    ctx, sk, m, ct = toy
    rng = np.random.default_rng(5)
    key = ctx.bt_key_gen(sk, rng)
    sk_n = None
    # regenerate with known ring key to threshold-share it
    sk_n = lwe.keygen(ctx.params, np.random.default_rng(5), dim=ctx.params.N)
    key = ctx.bt_key_gen(sk, np.random.default_rng(5), sk_n=sk_n)
    from fhe_tpu.tfhe.params import Gate
    ct2 = ctx.encrypt(sk, 1 - m, np.random.default_rng(6))
    ext = ctx.eval_bin_gate(key, Gate.OR, ct, ct2, extended=True)
    cfg = th.ThresholdConfig(threshold=2, total_parties=3, scheme="shamir")
    shares, vks = th.generate_key_shares(np.asarray(sk_n.s), ext.modulus,
                                         cfg)
    for subset in ([0, 1], [0, 2], [1, 2]):
        got = th.threshold_decrypt(cfg, ext, [shares[i] for i in subset],
                                   vks, p=4)
        np.testing.assert_array_equal(got % 2, np.ones_like(m))


def test_merkle_inclusion():
    mt = MerkleTree()
    blobs = [bytes([i] * 4) for i in range(7)]
    mt.build_from_data(blobs)
    for i in range(7):
        pr = mt.prove_inclusion(i)
        assert MerkleTree.verify_inclusion(mt.root, pr)
    pr = mt.prove_inclusion(3)
    pr.index = 4
    assert not MerkleTree.verify_inclusion(mt.root, pr)


def test_transcript_determinism():
    def build():
        tx = TranscriptBuilder("X")
        tx.append_u64(DomainTag.PARTY_ID, 7)
        tx.append_vector(DomainTag.PARTIAL_DEC, np.arange(5))
        return tx.challenge()
    assert build() == build()
    tx = TranscriptBuilder("X")
    tx.append_u64(DomainTag.PARTY_ID, 8)
    tx.append_vector(DomainTag.PARTIAL_DEC, np.arange(5))
    assert tx.challenge() != build()
