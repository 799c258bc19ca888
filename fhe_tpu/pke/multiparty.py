"""Multiparty (threshold) PKE: joint keygen, lead/main partial decryption
with noise flooding, fusion.

Reference semantics: /root/reference/src/pke/lib/schemebase/
base-multiparty.cpp (MultipartyKeyGen:52-120 -- additive secret sharing,
each party re-randomizes the running public key) and schemerns/
rns-multiparty.cpp (MultipartyDecryptLead:45 -- b = c0 + s*c1 + ns*e_flood;
MultipartyDecryptMain:111 -- s*c1 + ns*e_flood; fusion sums the shares).

TPU notes: every party's share computation is one pointwise EVAL op; the
fusion sum across parties maps to a cross-host `psum` over a DCN mesh when
parties are co-scheduled (SURVEY SS2.7 P6) -- `fuse()` takes any number of
share pytrees and is jit/shard_map compatible.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..lattice import rns
from ..lattice.rns import RnsPoly, EVAL
from . import rlwe

MP_SD = 1048576.0   # NoiseFlooding::MP_SD (utils/noise_flooding.h): 2^20


@dataclasses.dataclass(frozen=True)
class PartialDecryption:
    """One party's share: an RnsPoly (EVAL) to be summed at fusion."""
    share: RnsPoly
    is_lead: bool


def multiparty_keygen(params, n_parties: int, rng: np.random.Generator):
    """n-party joint keygen: party i samples s_i and re-randomizes the
    accumulated public key under the SAME uniform `a` (base-multiparty.cpp
    MultipartyKeyGen(publicKey,...)).  Joint secret = sum_i s_i.

    Returns (sks, joint_pk)."""
    mods = tuple(params.moduli)
    N = params.N
    ns = params.plain_mod if params.scheme == "BGV" else 1

    sks = [rlwe.keygen(params, rng) for _ in range(n_parties)]
    a = rlwe.uniform_poly(rng, mods, N)
    b = None
    for sk in sks:
        e = rns.to_eval(rlwe.signed_to_rns(
            ns * rlwe.sample_gauss(rng, N, params.std_dev), mods))
        term = rns.add(rns.neg(rns.mul(a, sk.eval_poly(mods))), e)
        b = term if b is None else rns.add(b, term)
    return sks, rlwe.PublicKey(b=b, a=a)


def _flood_noise(params, moduli: tuple, rng: np.random.Generator,
                 sd: float = MP_SD) -> RnsPoly:
    """Large-deviation Gaussian for noise flooding (MP_SD = 2^20,
    rns-multiparty.cpp:100-106).  Host-side variant (numpy rng)."""
    e = np.rint(rng.normal(0.0, sd, size=params.N)).astype(np.int64)
    return rns.to_eval(rlwe.signed_to_rns(e, moduli))


@functools.lru_cache(maxsize=None)
def _share_fn(moduli: tuple, N: int, ns: int, lead: bool, sd: float):
    """Jitted whole-share op: sample the flooding Gaussian ON DEVICE
    (jax.random threefry, rounded to ints -- the flooding deviate only
    needs its statistical size, not bit-parity with a host sampler),
    embed it in RNS, and fuse s*c1 (+ c0) + ns*e in one compiled call.
    One compilation per (chain, role)."""
    qs = [int(q) for q in moduli]

    def f(s_data, c1_data, c0_data, key):
        e = jnp.round(jax.random.normal(key, (N,)) * sd).astype(jnp.int32)
        planes = [(((e % q) + q) % q).astype(jnp.uint32) for q in qs]
        e_eval = rns.to_eval(RnsPoly(jnp.stack(planes), moduli, rns.COEFF))
        if ns != 1:
            e_eval = rns.mul_scalar(e_eval, ns)
        share = rns.mul(RnsPoly(s_data, moduli, EVAL),
                        RnsPoly(c1_data, moduli, EVAL))
        if lead:
            share = rns.add(RnsPoly(c0_data, moduli, EVAL), share)
        return rns.add(share, e_eval).data

    return jax.jit(f)


def decrypt_lead(params, sk: rlwe.SecretKey, c0: RnsPoly, c1: RnsPoly,
                 rng: np.random.Generator) -> PartialDecryption:
    """Lead share: c0 + s*c1 + ns*e_flood (rns-multiparty.cpp:45-108)."""
    ns = params.plain_mod if params.scheme == "BGV" else 1
    s = sk.eval_poly(c0.moduli)
    f = _share_fn(tuple(c0.moduli), params.N, int(ns), True, MP_SD)
    key = jax.random.key(int(rng.integers(1 << 62)))
    data = f(s.data, c1.data, c0.data, key)
    return PartialDecryption(share=RnsPoly(data, c0.moduli, EVAL),
                             is_lead=True)


def decrypt_main(params, sk: rlwe.SecretKey, c1: RnsPoly,
                 rng: np.random.Generator) -> PartialDecryption:
    """Non-lead share: s*c1 + ns*e_flood (rns-multiparty.cpp:111-164)."""
    ns = params.plain_mod if params.scheme == "BGV" else 1
    s = sk.eval_poly(c1.moduli)
    f = _share_fn(tuple(c1.moduli), params.N, int(ns), False, MP_SD)
    key = jax.random.key(int(rng.integers(1 << 62)))
    data = f(s.data, c1.data, c1.data, key)
    return PartialDecryption(share=RnsPoly(data, c1.moduli, EVAL),
                             is_lead=False)


def fuse(shares: list[PartialDecryption]) -> RnsPoly:
    """MultipartyDecryptFusion: sum of all shares = m + total noise.

    Exactly one share must be the lead. The sum is a tree of modular adds --
    across hosts this is the psum pattern."""
    assert sum(1 for s in shares if s.is_lead) == 1
    acc = shares[0].share
    for s in shares[1:]:
        acc = rns.add(acc, s.share)
    return rns.to_coeff(acc)


# ---------------------------------------------------------------------------
# Interactive multiparty bootstrapping (IntMPBoot*, cryptocontext.h:3422-3507;
# ckksrns-multiparty.cpp IntMPBootDecrypt :352, IntMPBootEncrypt :407,
# IntMPBootAdjustScale :452)
# ---------------------------------------------------------------------------
#
# Encryption-to-Share / Share-to-Encryption protocol (per party i, joint
# secret s = sum_i s_i), over the compressed basis Qc of the input ct:
#   h0_i = (s_i*c1 + e0_i - M_i) mod Qc     (masked decryption share)
#   h1_i = -s_i*a + e1_i + M_i              (re-encryption share, mod Q)
# with integer masks M_i uniform in [0, Qc/(8n)).  The mod-Qc ring
# arithmetic in h0 kills the q*I phase-wrap term, and the bound on the
# masks plus |m + e| < Qc/8 means the centered representative of
# w = (c0 + sum h0_i) mod Qc equals m + e - sum M_i EXACTLY (no wrap).
# Lifting w to the full basis and adding sum h1_i cancels the masks:
#   c0' = lift(w) + sum h1_i,  c1' = a,   c0' + a*s = m + e.
#
# Statistical hiding (reference: Mi uniform over R_{q*2^lambda},
# ckksrns-multiparty.cpp GenerateMi :288-299 + ExpandCRTBasis exact
# integer lift :313-325): the compressed basis keeps `extra_limbs`
# limbs ABOVE the base rescale block (int_boot_adjust_scale), so the
# mask range Qc/(8n) exceeds the value bound |m + e| ~ scale by
# lambda = log2(Qc / (8n * scale)) bits -- with the default 2 extra
# 31-bit limbs, lambda >= ~55 bits of statistical distance.


@dataclasses.dataclass(frozen=True)
class IntBootShares:
    h0: RnsPoly     # masked decryption share over Qc (EVAL)
    h1: RnsPoly     # re-encryption share over Q (EVAL)
    n_parties: int


def _centered_lift(p: RnsPoly, to_mods: tuple) -> RnsPoly:
    """Host: centered CRT lift of a COEFF poly to another basis."""
    big = rns.to_bigint(p)
    Qc = 1
    for q in p.moduli:
        Qc *= q
    half = Qc // 2
    signed = np.array([int(x) - Qc if int(x) > half else int(x)
                       for x in big], dtype=object)
    return rlwe.signed_to_rns(signed, to_mods)


def int_boot_adjust_scale(ctx, ct, extra_limbs: int = 2):
    """IntBootAdjustScale: compress the ciphertext to the base rescale
    block plus `extra_limbs` statistical-hiding limbs (Compress(...),
    ckksrns-multiparty.cpp:452; the reference's ciphertext compression
    level likewise keeps headroom towers above the mask range)."""
    from .ckks import Ciphertext
    keep = min(ctx.cd + extra_limbs, len(ct.moduli))
    drop = len(ct.moduli) - keep
    if drop <= 0:
        return ct
    return Ciphertext(rns.level_reduce(ct.c0, drop),
                      rns.level_reduce(ct.c1, drop), ct.scale)


def int_mp_boot_random_gen(params, rng: np.random.Generator) -> RnsPoly:
    """IntMPBootRandomElementGen: the common random polynomial `a` over
    the full chain (a CRS; sampled once and shared)."""
    return rlwe.uniform_poly(rng, tuple(params.moduli), params.N)


def _bounded_mask(rng: np.random.Generator, N: int, bound: int) -> np.ndarray:
    out = np.empty(N, dtype=object)
    for i in range(N):
        v = 0
        b = bound
        while b > 0:
            chunk = min(b, 1 << 62)
            v = v * chunk + int(rng.integers(0, chunk))
            b //= 1 << 62
            if b == 0:
                break
        out[i] = v % bound
    return out


def int_mp_boot_decrypt(params, sk: rlwe.SecretKey, ct_low, a: RnsPoly,
                        rng: np.random.Generator, n_parties: int = 2
                        ) -> IntBootShares:
    """IntMPBootDecrypt: one party's (masked decryption, re-encryption)
    share pair."""
    full_mods = tuple(params.moduli)
    qc_mods = ct_low.moduli
    N = params.N
    Qc = 1
    for q in qc_mods:
        Qc *= q
    m_coeffs = _bounded_mask(rng, N, Qc // (8 * n_parties))
    m_qc = rns.to_eval(rlwe.signed_to_rns(m_coeffs, qc_mods))
    m_full = rns.to_eval(rlwe.signed_to_rns(m_coeffs, full_mods))

    s_qc = sk.eval_poly(qc_mods)
    e0 = rns.to_eval(rlwe.signed_to_rns(
        rlwe.sample_gauss(rng, N, params.std_dev), qc_mods))
    h0 = rns.sub(rns.add(rns.mul(s_qc, ct_low.c1), e0), m_qc)

    s_f = sk.eval_poly(full_mods)
    e1 = rns.to_eval(rlwe.signed_to_rns(
        rlwe.sample_gauss(rng, N, params.std_dev), full_mods))
    h1 = rns.add(rns.add(rns.neg(rns.mul(s_f, a)), e1), m_full)
    return IntBootShares(h0=h0, h1=h1, n_parties=n_parties)


def int_mp_boot_add(shares: list["IntBootShares"]) -> "IntBootShares":
    """IntMPBootAdd: aggregate all parties' share pairs."""
    h0 = shares[0].h0
    h1 = shares[0].h1
    for s in shares[1:]:
        h0 = rns.add(h0, s.h0)
        h1 = rns.add(h1, s.h1)
    return IntBootShares(h0=h0, h1=h1, n_parties=shares[0].n_parties)


def int_mp_boot_encrypt(params, ct_low, agg: "IntBootShares", a: RnsPoly):
    """IntMPBootEncrypt: assemble the refreshed full-level ciphertext
    c0' = lift(c0 + h0) + h1, c1' = a."""
    from .ckks import Ciphertext
    full_mods = tuple(params.moduli)
    w = rns.add(ct_low.c0, agg.h0)
    w_full = rns.to_eval(_centered_lift(rns.to_coeff(w), full_mods))
    return Ciphertext(rns.add(w_full, agg.h1), a, ct_low.scale)
