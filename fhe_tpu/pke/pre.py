"""Proxy re-encryption (PRE): re-encrypt ciphertexts from Alice's key to
Bob's without decryption.

Reference semantics: /root/reference/src/pke/lib/schemebase/base-pre.cpp /
rns-pre.cpp (ReKeyGen = key switching key from sOld to sNew generated with
the NEW party's randomness; ReEncrypt = key switch on c1 + optional
rerandomization for HRA security).  Multi-hop works by chaining.

Built directly on the HYBRID switching machinery (rlwe.evk_gen /
rlwe.key_switch)."""

from __future__ import annotations

import numpy as np

from ..lattice import rns
from . import rlwe


def re_key_gen(params, sk_old: rlwe.SecretKey, sk_new: rlwe.SecretKey,
               rng: np.random.Generator, method: str = "hybrid",
               digit_bits: int = 0) -> rlwe.EvalKey:
    """Re-encryption key sOld -> sNew (base-pre.cpp ReKeyGen).

    method='bv' uses the digit-decomposition switch the reference pairs
    with PRE for low-depth configs (keyswitch-bv.cpp, relinWindow =
    digit_bits)."""
    ns = params.plain_mod if params.scheme == "BGV" else 1
    mods = tuple(params.moduli)
    s_old = sk_old.eval_poly(mods)
    if method == "bv":
        return rlwe.bv_evk_gen(params, s_old, sk_new, rng,
                               digit_bits=digit_bits, noise_scale=ns)
    return rlwe.evk_gen(params, s_old, sk_new, rng, noise_scale=ns)


def re_encrypt(params, rk: rlwe.EvalKey, c0: rns.RnsPoly, c1: rns.RnsPoly,
               rng: np.random.Generator | None = None,
               pk_new: rlwe.PublicKey | None = None):
    """Switch (c0, c1) under sOld to a ciphertext under sNew
    (base-pre.cpp ReEncrypt).  If pk_new is given, adds an encryption of
    zero for HRA-security rerandomization (rns-pre.cpp)."""
    d0, d1 = rlwe.key_switch(params, rk, c1)
    out0, out1 = rns.add(c0, d0), d1
    if pk_new is not None and rng is not None:
        ns = params.plain_mod if params.scheme == "BGV" else 1
        z0, z1 = rlwe.encrypt_pk(params, pk_new, _zero_poly(out0), rng,
                                 noise_scale=ns)
        out0, out1 = rns.add(out0, z0), rns.add(out1, z1)
    return out0, out1


def _zero_poly(like: rns.RnsPoly) -> rns.RnsPoly:
    import jax.numpy as jnp
    return rns.RnsPoly(jnp.zeros_like(like.data), like.moduli, like.fmt)
