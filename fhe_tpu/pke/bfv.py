"""BFV (RNS, HPS multiplication) scheme: scale-invariant exact integers.

Reference semantics: /root/reference/src/pke/lib/scheme/bfvrns/
bfvrns-leveledshe.cpp (EvalMultCore HPS path :222-236, :368-384 --
ExpandCRTBasis Q->QR, tensor product, ScaleAndRound by t/Q into R,
SwitchCRTBasis R->Q) and bfvrns-pke (Delta = floor(Q/t) encoding).

TPU notes: the auxiliary basis R has len(Q)+2 limbs so the tensor product
(with the approximate extension's +uQ slack) stays below QR; both basis
conversions use the integer-exact fraction rounding (modmath.
fraction_round_v) instead of the reference's double-precision floats.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..lattice import rns
from ..lattice.rns import RnsPoly, COEFF, EVAL
from ..math import primes
from . import rlwe, bgv
from .params import PkeParams, make_bfv_params


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Ciphertext:
    c0: RnsPoly
    c1: RnsPoly
    c2: RnsPoly | None = None

    @property
    def moduli(self) -> tuple:
        return self.c0.moduli


@dataclasses.dataclass
class BfvContext:
    params: PkeParams

    @classmethod
    def create(cls, N: int = 1 << 10, num_limbs: int = 3,
               plain_mod: int = 65537, mod_bits: int = 28,
               dnum: int = 2) -> "BfvContext":
        return cls(make_bfv_params(N=N, num_limbs=num_limbs,
                                   plain_mod=plain_mod, mod_bits=mod_bits,
                                   dnum=dnum))

    @property
    def t(self) -> int:
        return self.params.plain_mod

    @property
    def Q(self) -> int:
        Q = 1
        for q in self.params.moduli:
            Q *= q
        return Q

    def _aux_basis(self) -> tuple:
        """R: len(Q)+2 30-bit primes, disjoint from Q and P."""
        two_n = 2 * self.params.N
        avoid = set(self.params.moduli) | set(self.params.special_mods)
        out = []
        q = (1 << 30) - 1
        while len(out) < len(self.params.moduli) + 2:
            p = primes.prev_prime_congruent(q, two_n)
            if p not in avoid:
                out.append(p)
            q = p - 1
        return tuple(out)

    def keygen(self, rng):
        sk = rlwe.keygen(self.params, rng)
        pk = rlwe.pubkey_gen(self.params, sk, rng)
        return sk, pk

    def relin_key_gen(self, sk, rng, method: str = "hybrid",
                      digit_bits: int = 0) -> rlwe.EvalKey:
        """method: 'hybrid' or 'bv' (keyswitch-bv.cpp digit
        decomposition) -- as in the reference, both families apply."""
        mods = tuple(self.params.moduli)
        s = sk.eval_poly(mods)
        if method == "bv":
            return rlwe.bv_evk_gen(self.params, rns.mul(s, s), sk, rng,
                                   digit_bits=digit_bits)
        return rlwe.evk_gen(self.params, rns.mul(s, s), sk, rng)

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
                                         digit_bits=digit_bits)
            else:
                out[r] = rlwe.evk_gen(self.params, s_k, sk, rng)
        return out

    def make_plaintext(self, m, scaled: bool = True,
                       encoding: str = "packed") -> RnsPoly:
        """Delta * encode(m) over Q (scaled) or plain encode (for mul)."""
        mods = tuple(self.params.moduli)
        coeffs = self._encode(m, encoding)              # [N] in [0, t)
        pt = rlwe.signed_to_rns(coeffs, mods)
        if scaled:
            delta = self.Q // self.t
            dres = np.array([delta % q for q in mods], dtype=np.uint32)
            pt = rns.mul_scalar(pt, jnp.asarray(dres))
        return rns.to_eval(pt)

    def _encode(self, m, encoding: str) -> np.ndarray:
        from . import encodings as enc
        if encoding == "packed":
            return bgv.encode(m, self.t, self.params.N)
        if encoding == "coef":
            return enc.encode_coef_packed(m, self.t, self.params.N)
        if encoding == "string":
            return enc.encode_string(m, self.params.N, self.t)
        raise ValueError(f"unknown encoding {encoding!r}")

    def _decode(self, coeffs: np.ndarray, encoding: str):
        from . import encodings as enc
        if encoding == "packed":
            return bgv.decode(coeffs, self.t, self.params.N)
        if encoding == "coef":
            return enc.decode_coef_packed(coeffs, self.t)
        if encoding == "string":
            return enc.decode_string(coeffs, self.t)
        raise ValueError(f"unknown encoding {encoding!r}")

    def encrypt(self, pk, m, rng, encoding: str = "packed") -> Ciphertext:
        pt = self.make_plaintext(m, encoding=encoding)
        c0, c1 = rlwe.encrypt_pk(self.params, pk, pt, rng)
        return Ciphertext(c0, c1)

    def decrypt(self, sk, ct: Ciphertext,
                encoding: str = "packed") -> np.ndarray:
        ph = rlwe.decrypt_phase(sk, ct.c0, ct.c1)
        if ct.c2 is not None:
            s = sk.eval_poly(ct.moduli)
            ph = rns.add(ph, rns.to_coeff(rns.mul(rns.mul(ct.c2, s), s)))
        big = rns.to_bigint(ph)
        Q, t = self.Q, self.t
        coeffs = np.array(
            [((2 * int(x) * t + Q) // (2 * Q)) % t for x in big],
            dtype=np.int64)   # round(t*x/Q) mod t, exact integer arithmetic
        return self._decode(coeffs, encoding)

    # -- ops --------------------------------------------------------------
    def add(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        return Ciphertext(rns.add(a.c0, b.c0), rns.add(a.c1, b.c1))

    def sub(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        return Ciphertext(rns.sub(a.c0, b.c0), rns.sub(a.c1, b.c1))

    def add_plain(self, a: Ciphertext, m) -> Ciphertext:
        return Ciphertext(rns.add(a.c0, self.make_plaintext(m)), a.c1)

    def mul_plain(self, a: Ciphertext, m) -> Ciphertext:
        pt = self.make_plaintext(m, scaled=False)
        return Ciphertext(rns.mul(a.c0, pt), rns.mul(a.c1, pt))

    def mul(self, a: Ciphertext, b: Ciphertext,
            evk: rlwe.EvalKey | None = None,
            technique: str = "hps") -> Ciphertext:
        """EvalMultCore with selectable multiplicationTechnique
        (gen-cryptocontext params flag; bfvrns-leveledshe.cpp:551-574
        branches HPS vs BEHZ):

        - "hps": expand -> tensor -> t/Q round -> exact convert back
          (exact centered basis switches, smallest noise);
        - "behz": Montgomery base conversion q->Bsk with mtilde
          correction, tensor in q u Bsk, FastRNSFloor by Q,
          Shenoy-Kumaresan exact return (eprint 2016/510)."""
        if technique == "behz":
            return self._mul_behz(a, b, evk)
        q_mods = tuple(self.params.moduli)
        r_mods = self._aux_basis()
        qr = q_mods + r_mods

        def expand(c: RnsPoly) -> RnsPoly:
            # exact centered extension (ExpandCRTBasis/SwitchCRTBasis,
            # dcrtpoly-impl.h:1110): both bases represent the centered
            # integer in [-Q/2, Q/2), so the tensor product has no +uQ slack
            cc = rns.to_coeff(c)
            ext = rns.switch_crt_basis_exact(cc, r_mods, centered=True)
            data = jnp.concatenate([cc.data, ext.data], axis=-2)
            return rns.to_eval(rns.RnsPoly(data, qr, rns.COEFF))

        a0, a1 = expand(a.c0), expand(a.c1)
        b0, b1 = expand(b.c0), expand(b.c1)
        d0 = rns.mul(a0, b0)
        d1 = rns.add(rns.mul(a0, b1), rns.mul(a1, b0))
        d2 = rns.mul(a1, b1)

        def scale_back(d: RnsPoly) -> RnsPoly:
            dc = rns.to_coeff(d)
            w_r = rns.scale_and_round_t_over_q(dc, q_mods, r_mods, self.t)
            # W = round(t*V/Q) is signed: lift centered back to Q
            w_q = rns.switch_crt_basis_exact(w_r, q_mods, centered=True)
            return rns.to_eval(w_q)

        e0, e1, e2 = scale_back(d0), scale_back(d1), scale_back(d2)
        if evk is None:
            return Ciphertext(e0, e1, c2=e2)
        k0, k1 = rlwe.key_switch(self.params, evk, e2)
        return Ciphertext(rns.add(e0, k0), rns.add(e1, k1))

    def _mul_behz(self, a: Ciphertext, b: Ciphertext,
                  evk: rlwe.EvalKey | None = None) -> Ciphertext:
        """BEHZ multiplication (bfvrns-leveledshe.cpp:299-321 BEHZ branch;
        dcrtpoly FastBaseConvqToBskMontgomery / FastRNSFloorq /
        FastBaseConvSK).  Bsk = first L+1 aux primes + m_sk (last)."""
        q_mods = tuple(self.params.moduli)
        bsk = self._aux_basis()           # L+2 NTT-friendly 30-bit primes

        def lift(c: RnsPoly):
            cc = rns.to_coeff(c)
            ck = rns.fast_base_conv_q_to_bsk(cc, bsk)
            return c, rns.to_eval(ck)     # (eval over q, eval over bsk)

        a0q, a0k = lift(a.c0)
        a1q, a1k = lift(a.c1)
        b0q, b0k = lift(b.c0)
        b1q, b1k = lift(b.c1)
        ds = []
        for dq, dk in (
            (rns.mul(a0q, b0q), rns.mul(a0k, b0k)),
            (rns.add(rns.mul(a0q, b1q), rns.mul(a1q, b0q)),
             rns.add(rns.mul(a0k, b1k), rns.mul(a1k, b0k))),
            (rns.mul(a1q, b1q), rns.mul(a1k, b1k)),
        ):
            yq = rns.mul_scalar(rns.to_coeff(dq), self.t)
            yk = rns.mul_scalar(rns.to_coeff(dk), self.t)
            fl = rns.fast_rns_floor_q(yq, yk)
            ds.append(rns.to_eval(rns.fast_base_conv_sk(fl, q_mods)))
        e0, e1, e2 = ds
        if evk is None:
            return Ciphertext(e0, e1, c2=e2)
        k0, k1 = rlwe.key_switch(self.params, evk, e2)
        return Ciphertext(rns.add(e0, k0), rns.add(e1, k1))

    def square(self, a: Ciphertext, evk: rlwe.EvalKey | None = None,
               technique: str = "hps") -> Ciphertext:
        """EvalSquare (cryptocontext.h:1979)."""
        return self.mul(a, a, evk, technique)

    def rotate(self, a: Ciphertext, r: int, rot_keys: dict) -> Ciphertext:
        N = self.params.N
        k = pow(5, r % (2 * N), 2 * N)
        c0 = rns.automorphism(a.c0, k)
        c1 = rns.automorphism(a.c1, k)
        d0, d1 = rlwe.key_switch(self.params, rot_keys[r], c1)
        return Ciphertext(rns.add(c0, d0), d1)

    def dot_product(self, cts: list[Ciphertext], plains: list,
                    evk: rlwe.EvalKey) -> Ciphertext:
        """Encrypted-vector x plaintext-vector inner product, the BFV
        benchmark op (BASELINE config 4): sum_i ct_i * pt_i."""
        acc = self.mul_plain(cts[0], plains[0])
        for ct, m in zip(cts[1:], plains[1:]):
            acc = self.add(acc, self.mul_plain(ct, m))
        return acc
