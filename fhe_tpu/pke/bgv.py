"""BGV (RNS) scheme: exact integer SIMD arithmetic mod t.

Reference semantics: /root/reference/src/pke/lib/scheme/bgvrns/* and
schemerns/rns-leveledshe.cpp (ModReduceInternal:381 -- modulus reduction
with plaintext-preserving correction).  Encoding is packed SIMD slots via
the mod-t NTT (encoding/packedencoding.cpp) -- here t is prime with
t = 1 mod 2N so slots are a clean negacyclic NTT over Z_t.

Modulus reduction multiplies the plaintext by qL^-1 mod t; the factor is
tracked per-ciphertext (pt_scale) and removed at decryption, mirroring the
reference's FLEXIBLEAUTO BGV scaling bookkeeping.

Noise is t-scaled everywhere (pk, encryption, keyswitch keys): that is the
`noise_scale = t` hook threaded through rlwe.py (the reference's
CryptoParametersRNS::GetNoiseScale for BGV).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..lattice import rns
from ..lattice.rns import RnsPoly, COEFF, EVAL
from ..math import ntt as nttmod
from . import rlwe
from .params import PkeParams, make_bgv_params


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Ciphertext:
    """pt_scale: the accumulated mod-t factor from modulus reductions
    (phase = pt_scale * m mod t); removed at decryption."""
    c0: RnsPoly
    c1: RnsPoly
    c2: RnsPoly | None = None
    pt_scale: int = dataclasses.field(metadata=dict(static=True), default=1)

    @property
    def moduli(self) -> tuple:
        return self.c0.moduli


def encode(m: np.ndarray, t: int, N: int) -> np.ndarray:
    """Packed SIMD slots [N] over Z_t -> coefficients (inverse mod-t NTT)."""
    plan = nttmod.make_plan(N, t)
    vals = jnp.asarray((np.asarray(m, dtype=np.int64) % t)
                       .astype(np.uint32))
    if vals.shape[-1] < N:
        vals = jnp.concatenate(
            [vals, jnp.zeros(N - vals.shape[-1], jnp.uint32)], -1)
    return np.asarray(nttmod.inverse_butterfly(plan, vals)).astype(np.int64)


def decode(coeffs: np.ndarray, t: int, N: int) -> np.ndarray:
    """Coefficients mod t -> packed slots (forward mod-t NTT)."""
    plan = nttmod.make_plan(N, t)
    vals = jnp.asarray((np.asarray(coeffs, dtype=np.int64) % t)
                       .astype(np.uint32))
    return np.asarray(nttmod.forward_butterfly(plan, vals)).astype(np.int64)


@dataclasses.dataclass
class BgvContext:
    params: PkeParams

    @classmethod
    def create(cls, N: int = 1 << 10, num_levels: int = 3,
               plain_mod: int = 65537, mod_bits: int = 28,
               dnum: int = 2) -> "BgvContext":
        return cls(make_bgv_params(N=N, num_levels=num_levels,
                                   plain_mod=plain_mod, mod_bits=mod_bits,
                                   dnum=dnum))

    @property
    def t(self) -> int:
        return self.params.plain_mod

    def keygen(self, rng):
        sk = rlwe.keygen(self.params, rng)
        pk = rlwe.pubkey_gen(self.params, sk, rng, noise_scale=self.t)
        return sk, pk

    def relin_key_gen(self, sk, rng, method: str = "hybrid",
                      digit_bits: int = 0) -> rlwe.EvalKey:
        """method: 'hybrid' (keyswitch-hybrid.cpp) or 'bv'
        (keyswitch-bv.cpp, relinWindow=digit_bits) -- both key-switch
        families apply to every RNS scheme, as in the reference."""
        mods = tuple(self.params.moduli)
        s = sk.eval_poly(mods)
        if method == "bv":
            return rlwe.bv_evk_gen(self.params, rns.mul(s, s), sk, rng,
                                   digit_bits=digit_bits,
                                   noise_scale=self.t)
        return rlwe.evk_gen(self.params, rns.mul(s, s), sk, rng,
                            noise_scale=self.t)

    def rotation_key_gen(self, sk, rots, rng, method: str = "hybrid",
                         digit_bits: int = 0) -> dict:
        mods = tuple(self.params.moduli)
        N = self.params.N
        s = sk.eval_poly(mods)
        out = {}
        for r in rots:
            k = pow(5, r % (2 * N), 2 * N)
            s_k = rns.automorphism(s, k)
            if method == "bv":
                out[r] = rlwe.bv_evk_gen(self.params, s_k, sk, rng,
                                         digit_bits=digit_bits,
                                         noise_scale=self.t)
            else:
                out[r] = rlwe.evk_gen(self.params, s_k, sk, rng,
                                      noise_scale=self.t)
        return out

    def make_plaintext(self, m, mods: tuple | None = None,
                       encoding: str = "packed") -> RnsPoly:
        mods = mods or tuple(self.params.moduli)
        coeffs = self._encode(m, encoding)
        return rns.to_eval(rlwe.signed_to_rns(coeffs, mods))

    def _encode(self, m, encoding: str) -> np.ndarray:
        """packed (SIMD slots) / coef / string (encoding/*encoding.h)."""
        from . import encodings as enc
        if encoding == "packed":
            return encode(m, self.t, self.params.N)
        if encoding == "coef":
            return enc.encode_coef_packed(m, self.t, self.params.N)
        if encoding == "string":
            return enc.encode_string(m, self.params.N, self.t)
        raise ValueError(f"unknown encoding {encoding!r}")

    def _decode(self, coeffs: np.ndarray, encoding: str):
        from . import encodings as enc
        if encoding == "packed":
            return decode(coeffs, self.t, self.params.N)
        if encoding == "coef":
            return enc.decode_coef_packed(coeffs, self.t)
        if encoding == "string":
            return enc.decode_string(coeffs, self.t)
        raise ValueError(f"unknown encoding {encoding!r}")

    def encrypt(self, pk, m, rng, encoding: str = "packed") -> Ciphertext:
        pt = self.make_plaintext(m, encoding=encoding)
        c0, c1 = rlwe.encrypt_pk(self.params, pk, pt, rng,
                                 noise_scale=self.t)
        return Ciphertext(c0, c1)

    def decrypt(self, sk, ct: Ciphertext,
                encoding: str = "packed") -> np.ndarray:
        ph = rlwe.decrypt_phase(sk, ct.c0, ct.c1)
        if ct.c2 is not None:
            s = sk.eval_poly(ct.moduli)
            ph = rns.add(ph, rns.to_coeff(rns.mul(rns.mul(ct.c2, s), s)))
        big = rns.to_bigint(ph)
        Q = 1
        for q in ct.moduli:
            Q *= q
        t = self.t
        inv = pow(ct.pt_scale % t, -1, t)
        coeffs = np.array(
            [((int(x) if int(x) <= Q // 2 else int(x) - Q) * inv) % t
             for x in big], dtype=np.int64)
        return self._decode(coeffs, encoding)

    # -- ops ------------------------------------------------------------------
    def adjust_level(self, a: Ciphertext, num_limbs: int) -> Ciphertext:
        """ModReduce a down to a num_limbs basis (the reference's
        LeveledSHERNS auto level adjustment, rns-leveledshe.cpp:182-191).

        Degree-2 only: mod_reduce and the _match scale adjustment rebuild
        (c0, c1) and would silently drop a c2 component — relinearize
        degree-3 ciphertexts before mixing levels/scales."""
        if len(a.moduli) > num_limbs:
            assert a.c2 is None, \
                "adjust_level requires a relinearized (degree-2) ciphertext"
        while len(a.moduli) > num_limbs:
            a = self.mod_reduce(a)
        return a

    def _match(self, a: Ciphertext, b: Ciphertext, scales: bool = True
               ) -> tuple[Ciphertext, Ciphertext]:
        """Bring both operands to the shorter basis; for add/sub also equate
        the plaintext scale factors by an exact scalar multiply (the BGV
        scaling-factor adjustment of rns-leveledshe.cpp EvalAdd)."""
        n = min(len(a.moduli), len(b.moduli))
        a = self.adjust_level(a, n)
        b = self.adjust_level(b, n)
        if scales and a.pt_scale != b.pt_scale:
            assert a.c2 is None and b.c2 is None, \
                "scale adjustment requires relinearized operands"
            t = self.t
            k = b.pt_scale * pow(a.pt_scale, -1, t) % t
            a = Ciphertext(rns.mul_scalar(a.c0, k), rns.mul_scalar(a.c1, k),
                           pt_scale=b.pt_scale)
        return a, b

    def add(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        a, b = self._match(a, b)
        return Ciphertext(rns.add(a.c0, b.c0), rns.add(a.c1, b.c1),
                          pt_scale=a.pt_scale)

    def sub(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        a, b = self._match(a, b)
        return Ciphertext(rns.sub(a.c0, b.c0), rns.sub(a.c1, b.c1),
                          pt_scale=a.pt_scale)

    def add_plain(self, a: Ciphertext, m) -> Ciphertext:
        m = np.asarray(m, dtype=np.int64)
        if a.pt_scale != 1:
            m = m * a.pt_scale % self.t
        pt = self.make_plaintext(m, a.moduli)
        return Ciphertext(rns.add(a.c0, pt), a.c1, pt_scale=a.pt_scale)

    def mul_plain(self, a: Ciphertext, m) -> Ciphertext:
        pt = self.make_plaintext(m, a.moduli)
        return Ciphertext(rns.mul(a.c0, pt), rns.mul(a.c1, pt),
                          pt_scale=a.pt_scale)

    def mul(self, a: Ciphertext, b: Ciphertext,
            evk: rlwe.EvalKey | None = None) -> Ciphertext:
        a, b = self._match(a, b, scales=False)
        d0 = rns.mul(a.c0, b.c0)
        d1 = rns.add(rns.mul(a.c0, b.c1), rns.mul(a.c1, b.c0))
        d2 = rns.mul(a.c1, b.c1)
        sf = (a.pt_scale * b.pt_scale) % self.t
        if evk is None:
            return Ciphertext(d0, d1, c2=d2, pt_scale=sf)
        k0, k1 = rlwe.key_switch(self.params, evk, d2)
        return Ciphertext(rns.add(d0, k0), rns.add(d1, k1), pt_scale=sf)

    def square(self, a: Ciphertext,
               evk: rlwe.EvalKey | None = None) -> Ciphertext:
        """EvalSquare (cryptocontext.h:1979)."""
        return self.mul(a, a, evk)

    def rotate(self, a: Ciphertext, r: int, rot_keys: dict) -> Ciphertext:
        N = self.params.N
        k = pow(5, r % (2 * N), 2 * N)
        c0 = rns.automorphism(a.c0, k)
        c1 = rns.automorphism(a.c1, k)
        d0, d1 = rlwe.key_switch(self.params, rot_keys[r], c1)
        return Ciphertext(rns.add(c0, d0), d1, pt_scale=a.pt_scale)

    def mod_reduce(self, a: Ciphertext) -> Ciphertext:
        """Drop the last limb with plaintext-preserving correction
        (rns-leveledshe.cpp ModReduceInternal): c' = (c - delta) / qL with
        delta = c mod qL lifted to a multiple of t (centered)."""
        t = self.t
        out = []
        for c in (a.c0, a.c1):
            cc = rns.to_coeff(c)
            out.append(rns.to_eval(_mod_reduce_poly(cc, t)))
        qL = a.moduli[-1]
        sf = (a.pt_scale * pow(qL % t, -1, t)) % t
        return Ciphertext(out[0], out[1], pt_scale=sf)


def _mod_reduce_poly(p: RnsPoly, t: int) -> RnsPoly:
    """(p - delta) * qL^-1 over the truncated basis, delta = t*[cL*t^-1]_qL
    centered (so delta = cL mod qL and delta = 0 mod t)."""
    from ..math.modmath import (u32, sub_mod, add_mod, barrett_reduce_u32,
                                mont_constants, mont_mul)
    mods = p.moduli
    qL = mods[-1]
    keep = mods[:-1]
    cL = p.data[..., -1, :]                       # [N] or [..., N] < qL
    # u = cL * t^-1 mod qL, centered to (-qL/2, qL/2]
    qinv_neg, _r1, r2 = mont_constants(qL)
    tinv = pow(t, -1, qL)
    tinv_m = np.uint32((tinv << 32) % qL)
    u = mont_mul(cL, jnp.asarray(tinv_m), qL, jnp.asarray(qinv_neg))
    u_signed = jnp.where(u > qL // 2, u.astype(jnp.int32) - jnp.int32(qL),
                         u.astype(jnp.int32))            # qL < 2^31
    # delta mod q_i = (t mod q_i) * (u_signed mod q_i)
    plan_k = rns.make_rns_plan(p.N, keep)
    qk = plan_k.q_arr[:, None]
    u_mod = jnp.mod(u_signed[..., None, :],
                    plan_k.q_arr.astype(jnp.int32)[:, None]).astype(jnp.uint32)
    t_res = jnp.asarray(np.array([t % q for q in keep], np.uint32))[:, None]
    tm = mont_mul(t_res, plan_k.r2[:, None], qk, plan_k.qinv_neg[:, None])
    delta = mont_mul(u_mod, tm, qk, plan_k.qinv_neg[:, None])
    diff = sub_mod(p.data[..., :-1, :], delta, qk)
    qlinv = np.array([pow(qL % q, -1, q) for q in keep], dtype=np.uint32)
    out = RnsPoly(diff, keep, COEFF)
    return rns.mul_scalar(out, jnp.asarray(qlinv))
