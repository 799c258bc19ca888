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

import numpy as np
import jax

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
    rns-multiparty.cpp:100-106)."""
    e = np.rint(rng.normal(0.0, sd, size=params.N)).astype(np.int64)
    return rns.to_eval(rlwe.signed_to_rns(e, moduli))


def decrypt_lead(params, sk: rlwe.SecretKey, c0: RnsPoly, c1: RnsPoly,
                 rng: np.random.Generator) -> PartialDecryption:
    """Lead share: c0 + s*c1 + ns*e_flood (rns-multiparty.cpp:45-108)."""
    ns = params.plain_mod if params.scheme == "BGV" else 1
    s = sk.eval_poly(c0.moduli)
    e = _flood_noise(params, c0.moduli, rng)
    if ns != 1:
        e = rns.mul_scalar(e, ns)
    share = rns.add(rns.add(c0, rns.mul(s, c1)), e)
    return PartialDecryption(share=share, is_lead=True)


def decrypt_main(params, sk: rlwe.SecretKey, c1: RnsPoly,
                 rng: np.random.Generator) -> PartialDecryption:
    """Non-lead share: s*c1 + ns*e_flood (rns-multiparty.cpp:111-164)."""
    ns = params.plain_mod if params.scheme == "BGV" else 1
    s = sk.eval_poly(c1.moduli)
    e = _flood_noise(params, c1.moduli, rng)
    if ns != 1:
        e = rns.mul_scalar(e, ns)
    return PartialDecryption(share=rns.add(rns.mul(s, c1), e), is_lead=False)


def fuse(shares: list[PartialDecryption]) -> RnsPoly:
    """MultipartyDecryptFusion: sum of all shares = m + total noise.

    Exactly one share must be the lead. The sum is a tree of modular adds --
    across hosts this is the psum pattern."""
    assert sum(1 for s in shares if s.is_lead) == 1
    acc = shares[0].share
    for s in shares[1:]:
        acc = rns.add(acc, s.share)
    return rns.to_coeff(acc)
