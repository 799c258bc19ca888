"""Batched threshold (t-of-n) TFHE decryption with verifiable partial
decryptions.

Reference semantics: /root/reference/src/binfhe/include/threshold/
batch_threshold.h -- ThresholdConfig (:47-62), KeyShare (:72),
BatchPartialDecryption (:122), CorrectnessProof (:145, Chaum-Pedersen
style with Merkle-batched Fiat-Shamir, :155-177), GenerateKeyShares
(lib/threshold/batch_threshold.cpp:650 -- additive sharing),
ComputeLagrangeCoefficients (:212), BatchCombineShares (:287-305),
ThresholdDecryptPipeline (:362).

Design notes (and deliberate upgrades over the reference):
* The reference's GenerateKeyShares is additive n-of-n with a
  deterministic placeholder RNG and a TODO for Shamir; here additive
  sharing uses a real CSPRNG, and true Shamir t-of-n is supported for
  prime ciphertext moduli (Q-extended ciphertexts -- the gate modulus
  q = 2^k admits no Lagrange inversion, which the reference's Lagrange
  path would throw on).
* The reference's DLEQ proof is a stub (batch_threshold.cpp:371 TODO);
  here partial decryptions carry a sound linear-map sigma protocol:
  commit R_j = <a_j, r>, Merkle-hash all R_j, one Fiat-Shamir challenge
  c, response z = r + c*s_i; verifier checks <a_j, z> = R_j + c*d_j for
  every batch element.  (Honest-verifier ZK for the statement "all d_j
  are consistent evaluations of one committed share".)
* Partial decryption is one [B, n] x [n] modular matvec -- on TPU this
  rides the MXU via the batch axis (SURVEY SS2.7 P6: protocol-level
  distribution; the cross-host combine is a psum over the party axis).
"""

from __future__ import annotations

import dataclasses
import secrets

import numpy as np

from .params import TfheParams
from . import lwe
from .transcript import TranscriptBuilder, MerkleTree, DomainTag


@dataclasses.dataclass(frozen=True)
class ThresholdConfig:
    """batch_threshold.h:47-62."""
    threshold: int = 2
    total_parties: int = 3
    verify_proofs: bool = True
    generate_proofs: bool = True
    scheme: str = "additive"     # "additive" (n-of-n) or "shamir" (t-of-n)


@dataclasses.dataclass
class KeyShare:
    party_id: int                # 1-indexed
    share: np.ndarray            # [dim] uint64 mod q
    commitment: bytes            # transcript hash of the share


@dataclasses.dataclass
class VerificationKey:
    party_id: int
    commitment: bytes


@dataclasses.dataclass
class BatchPartialDecryption:
    party_id: int
    values: np.ndarray           # [B] uint64: d_j = <a_j, s_i> mod q
    batch_commitment: bytes      # Merkle root over values


@dataclasses.dataclass
class BatchCorrectnessProof:
    party_id: int
    commitments_R: np.ndarray    # [B] uint64: R_j = <a_j, r> mod q
    merkle_root: bytes
    batch_challenge: bytes
    response: np.ndarray         # [dim] uint64: z = r + c*s_i mod q


def _csprng_vec(dim: int, q: int) -> np.ndarray:
    """Rejection-free uniform vector mod q from the OS CSPRNG."""
    raw = np.frombuffer(secrets.token_bytes(8 * dim), dtype=np.uint64)
    return (raw % np.uint64(q)).astype(np.uint64)


def _share_commitment(party_id: int, share: np.ndarray) -> bytes:
    tx = TranscriptBuilder("ShareCommit")
    tx.append_u64(DomainTag.KEY_SHARE, party_id)
    tx.append_vector(DomainTag.KEY_SHARE, share)
    return tx.challenge()


def generate_key_shares(sk_vec: np.ndarray, q: int, cfg: ThresholdConfig
                        ) -> tuple[list[KeyShare], list[VerificationKey]]:
    """Split the LWE secret (as a vector mod q) into shares
    (GenerateKeyShares, batch_threshold.cpp:650).

    additive: sk = sum_i s_i mod q (n-of-n; works for any q).
    shamir: per-coefficient degree-(t-1) polynomials (t-of-n; requires
    prime q so Lagrange denominators invert -- use on Q-extended cts)."""
    n_par, t = cfg.total_parties, cfg.threshold
    dim = len(sk_vec)
    sk_mod = (np.asarray(sk_vec, dtype=np.int64) % q).astype(np.uint64)
    shares = []
    if cfg.scheme == "additive":
        acc = np.zeros(dim, dtype=np.uint64)
        for pid in range(1, n_par):
            sh = _csprng_vec(dim, q)
            acc = (acc + sh) % np.uint64(q)
            shares.append(KeyShare(pid, sh, _share_commitment(pid, sh)))
        last = (sk_mod + np.uint64(q) - acc % np.uint64(q)) % np.uint64(q)
        shares.append(KeyShare(n_par, last,
                               _share_commitment(n_par, last)))
    elif cfg.scheme == "shamir":
        # check q prime enough for Lagrange on party ids
        for i in range(1, n_par + 1):
            for j in range(i + 1, n_par + 1):
                try:
                    pow(j - i, -1, q)
                except ValueError:
                    raise ValueError(
                        "shamir sharing needs pairwise-invertible party-id "
                        f"differences mod q={q}; use additive for 2^k moduli")
        coeffs = [sk_mod] + [_csprng_vec(dim, q) for _ in range(t - 1)]
        for pid in range(1, n_par + 1):
            sh = np.zeros(dim, dtype=np.uint64)
            x = 1
            for c in coeffs:
                sh = (sh + c * np.uint64(x)) % np.uint64(q)
                x = (x * pid) % q
            shares.append(KeyShare(pid, sh, _share_commitment(pid, sh)))
    else:
        raise ValueError(cfg.scheme)
    vks = [VerificationKey(s.party_id, s.commitment) for s in shares]
    return shares, vks


def lagrange_coefficients(party_ids: list[int], q: int) -> list[int]:
    """lambda_i = prod_j j/(j-i) mod q at x=0
    (ComputeLagrangeCoefficients, batch_threshold.cpp:212-242)."""
    out = []
    for i in party_ids:
        num, den = 1, 1
        for j in party_ids:
            if j == i:
                continue
            num = (num * j) % q
            den = (den * (j - i)) % q
        out.append((num * pow(den, -1, q)) % q)
    return out


def _inner_products(a: np.ndarray, s: np.ndarray, q: int) -> np.ndarray:
    """[B, dim] x [dim] -> [B] mod q, exact in object/int64 chunks."""
    a64 = np.asarray(a, dtype=np.uint64)
    # q < 2^32 and dim < 2^16, so uint64 partial sums are exact as long as
    # we reduce every 2^14 terms (2^32 * 2^14 < 2^64 - slack).
    B, dim = a64.shape
    acc = np.zeros(B, dtype=np.uint64)
    step = 1 << 14
    for lo in range(0, dim, step):
        part = (a64[:, lo:lo + step] * s[lo:lo + step]) % np.uint64(q)
        acc = (acc + part.sum(axis=1, dtype=np.uint64)) % np.uint64(q)
    return acc


def batch_partial_decrypt(cfg: ThresholdConfig, cts: lwe.LweCiphertext,
                          share: KeyShare
                          ) -> tuple[BatchPartialDecryption,
                                     BatchCorrectnessProof | None]:
    """BatchPartialDecrypt (batch_threshold.h:230): d_j = <a_j, s_i>,
    optional batched sigma-protocol proof."""
    q = cts.modulus
    a = np.asarray(cts.a, dtype=np.uint64).reshape(-1, cts.a.shape[-1])
    d = _inner_products(a, share.share, q)
    mt = MerkleTree()
    mt.build_from_data([int(x).to_bytes(8, "little") for x in d])
    out = BatchPartialDecryption(share.party_id, d, mt.root)
    if not cfg.generate_proofs:
        return out, None
    dim = a.shape[1]
    r = _csprng_vec(dim, q)
    R = _inner_products(a, r, q)
    mtR = MerkleTree()
    mtR.build_from_data([int(x).to_bytes(8, "little") for x in R])
    tx = TranscriptBuilder("PartialDecProof")
    tx.append_u64(DomainTag.PARTY_ID, share.party_id)
    tx.append_hash(DomainTag.COMMITMENT, share.commitment)
    tx.append_hash(DomainTag.MERKLE_NODE, mt.root)
    tx.append_hash(DomainTag.MERKLE_NODE, mtR.root)
    c = tx.challenge_int(q)
    z = (r + np.uint64(c) * share.share % np.uint64(q)) % np.uint64(q)
    proof = BatchCorrectnessProof(share.party_id, R, mtR.root,
                                  tx.current_hash, z)
    return out, proof


def batch_verify_proofs(cfg: ThresholdConfig, cts: lwe.LweCiphertext,
                        partial: BatchPartialDecryption,
                        proof: BatchCorrectnessProof,
                        vk: VerificationKey) -> bool:
    """BatchVerifyProofs (batch_threshold.h:278): check
    <a_j, z> == R_j + c*d_j mod q for all j (one batched matvec)."""
    q = cts.modulus
    a = np.asarray(cts.a, dtype=np.uint64).reshape(-1, cts.a.shape[-1])
    mtR = MerkleTree()
    mtR.build_from_data([int(x).to_bytes(8, "little") for x in
                         proof.commitments_R])
    if mtR.root != proof.merkle_root:
        return False
    mt = MerkleTree()
    mt.build_from_data([int(x).to_bytes(8, "little") for x in
                        partial.values])
    tx = TranscriptBuilder("PartialDecProof")
    tx.append_u64(DomainTag.PARTY_ID, proof.party_id)
    tx.append_hash(DomainTag.COMMITMENT, vk.commitment)
    tx.append_hash(DomainTag.MERKLE_NODE, mt.root)
    tx.append_hash(DomainTag.MERKLE_NODE, proof.merkle_root)
    c = tx.challenge_int(q)
    lhs = _inner_products(a, proof.response, q)
    rhs = (proof.commitments_R +
           np.uint64(c) * partial.values % np.uint64(q)) % np.uint64(q)
    return bool(np.array_equal(lhs, rhs))


def batch_combine(cfg: ThresholdConfig, cts: lwe.LweCiphertext,
                  partials: list[BatchPartialDecryption],
                  p: int | None = None) -> np.ndarray:
    """BatchCombineShares (batch_threshold.h:257):
    m_j = round(p/q * (b_j - sum_i lambda_i d_{i,j}))."""
    q = cts.modulus
    p = p or cts.pt_mod
    b = np.asarray(cts.b, dtype=np.uint64).reshape(-1)
    if cfg.scheme == "additive":
        if len(partials) != cfg.total_parties:
            raise ValueError("additive sharing needs all n parties")
        lams = [1] * len(partials)
    else:
        ids = [pd.party_id for pd in partials]
        if len(ids) < cfg.threshold:
            raise ValueError("not enough shares")
        lams = lagrange_coefficients(ids, q)
    acc = np.zeros_like(b)
    for lam, pd in zip(lams, partials):
        acc = (acc + np.uint64(lam) * pd.values % np.uint64(q)) \
            % np.uint64(q)
    phase = (b + np.uint64(q) - acc) % np.uint64(q)
    m = ((phase.astype(np.float64) * p / q) + 0.5).astype(np.int64) % p
    return m


def threshold_decrypt(cfg: ThresholdConfig, cts: lwe.LweCiphertext,
                      shares: list[KeyShare],
                      vks: list[VerificationKey] | None = None,
                      p: int | None = None) -> np.ndarray:
    """ThresholdDecryptPipeline (batch_threshold.h:362): single-process
    simulation of the full protocol (reference test strategy: all parties
    in-process, UnitTestMultiparty pattern)."""
    partials = []
    for sh in shares:
        pd, proof = batch_partial_decrypt(cfg, cts, sh)
        if cfg.generate_proofs and cfg.verify_proofs and vks is not None:
            vk = next(v for v in vks if v.party_id == sh.party_id)
            if not batch_verify_proofs(cfg, cts, pd, proof, vk):
                raise ValueError(f"proof failed for party {sh.party_id}")
        partials.append(pd)
    return batch_combine(cfg, cts, partials, p)
