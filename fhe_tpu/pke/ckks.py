"""CKKS (RNS) scheme: canonical-embedding encoding, leveled arithmetic,
rescaling, rotations, conjugation.

Reference semantics: /root/reference/src/pke/lib/scheme/ckksrns/
ckksrns-leveledshe.cpp (rescale = DropLastElementAndScale :162-183),
encoding lib/encoding/ckkspackedencoding.cpp (canonical embedding over the
5^j subgroup), keyswitch via HYBRID (see rlwe.py).

TPU notes: ciphertexts are RnsPoly pairs [L, N]; all leveled ops are
pointwise VPU work; rotations are EVAL-format permutations + one key
switch. Encode/decode run host-side in float64 exactly like the
reference's double-precision DFT (math/dftransform.cpp).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..lattice import rns
from ..lattice.rns import RnsPoly, COEFF, EVAL
from . import rlwe
from .params import PkeParams, make_ckks_params


# ---------------------------------------------------------------------------
# canonical embedding (host, float64)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _embedding_tables(N: int):
    """Slot order: g_j = 5^j mod 2N, j in [0, N/2); t_j = (g_j - 1) / 2."""
    slots = N // 2
    g = np.zeros(slots, dtype=np.int64)
    cur = 1
    for j in range(slots):
        g[j] = cur
        cur = (cur * 5) % (2 * N)
    t = (g - 1) // 2
    t_conj = ((2 * N - g) - 1) // 2
    zeta_pow = np.exp(1j * np.pi * np.arange(N) / N)   # zeta^k
    return t, t_conj, zeta_pow


def encode(z, N: int, scale: float, slots: int | None = None) -> np.ndarray:
    """Complex slots -> integer coefficients [N] (signed int64).

    Default (slots=None): fully packed, N/2 slots, short inputs zero-padded.
    Explicit slots=s < N/2: SPARSE packing (ckkspackedencoding.cpp:115-192 +
    FitToNativeVector gap placement :522-530) -- the message is encoded on
    the subring Z[Y]/(Y^{2s}+1), Y = X^{N/(2s)}: the 2s small-ring
    coefficients land on a stride-N/(2s) grid, and the full-ring slot view
    is the s-slot message replicated N/(2s) times (period s)."""
    s = slots or N // 2
    n2 = 2 * s                           # small-ring dimension
    d = N // n2                          # coefficient stride (gap)
    z = np.asarray(z, dtype=np.complex128)
    if z.shape[-1] < s:
        z = np.concatenate([z, np.zeros(s - z.shape[-1],
                                        dtype=np.complex128)])
    t, t_conj, zeta = _embedding_tables(n2)
    F = np.zeros(n2, dtype=np.complex128)
    F[t] = z
    F[t_conj] = np.conj(z)
    w = np.fft.fft(F) / n2               # inverse of S = n2 * ifft(w)
    v = np.real(w / zeta) * scale        # small-ring real coefficients [2s]
    if d == 1:
        m = v
    else:
        m = np.zeros(N, dtype=np.float64)
        m[::d] = v
    return np.rint(m).astype(np.int64)


def decode(m: np.ndarray, N: int, scale: float, slots: int | None = None,
           sparse: bool = False) -> np.ndarray:
    """Signed coefficients [N] -> complex slots.

    sparse=True with slots=s reads the stride-N/(2s) subring coefficients
    (the reference decode's gap walk, ckkspackedencoding.cpp:341-401);
    sparse=False decodes fully packed and truncates to `slots`."""
    if sparse and slots and slots < N // 2:
        d = N // (2 * slots)
        m = m[::d]                       # [2*slots] small-ring coefficients
        N = 2 * slots
    t, _t_conj, zeta = _embedding_tables(N)
    w = m.astype(np.float64) * zeta
    S = N * np.fft.ifft(w)
    out = S[t] / scale
    return out[:slots] if slots else out


def _center(big, Q: int) -> np.ndarray:
    out = np.empty(len(big), dtype=np.float64)
    half = Q // 2
    for i, x in enumerate(big):
        x = int(x)
        out[i] = float(x - Q) if x > half else float(x)
    return out


def _center_int(big, Q: int) -> list[int]:
    half = Q // 2
    return [int(x) - Q if int(x) > half else int(x) for x in big]


# ---------------------------------------------------------------------------
# ciphertext + context
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Ciphertext:
    """CKKS ciphertext: polys in EVAL over the current chain; scale/level
    tracked statically (FLEXIBLEAUTO-style host bookkeeping)."""
    c0: RnsPoly
    c1: RnsPoly
    scale: float = dataclasses.field(metadata=dict(static=True))
    c2: RnsPoly | None = None     # degree-2 component before relin
    c_rest: tuple = ()            # degree >= 3 components (EvalMultNoRelin
    #                               chains; cryptocontext.h EvalMultNoRelin /
    #                               EvalMultAndRelinearize)

    def components(self) -> list:
        """All polynomial components [c0, c1, c2, ...]."""
        out = [self.c0, self.c1]
        if self.c2 is not None:
            out.append(self.c2)
        out.extend(self.c_rest)
        return out

    @property
    def moduli(self) -> tuple:
        return self.c0.moduli

    @property
    def level_limbs(self) -> int:
        return len(self.c0.moduli)


@functools.lru_cache(maxsize=None)
def _level_scales(params) -> dict:
    cd = params.composite_degree
    mods = params.moduli
    L = len(mods)
    out = {L: float(1 << params.scale_bits)}
    s = out[L]
    while L - cd >= cd:
        qb = 1.0
        for q in mods[L - cd:L]:
            qb *= float(q)
        s = s * s / qb
        L -= cd
        out[L] = s
    return out


@dataclasses.dataclass
class CkksContext:
    params: PkeParams

    @classmethod
    def create(cls, N: int = 1 << 12, num_levels: int = 6,
               scale_bits: int = 28, dnum: int = 3,
               composite_degree: int = 1,
               first_bits: int | None = None) -> "CkksContext":
        fb = first_bits if first_bits is not None else \
            (30 if composite_degree == 1 else 30 * composite_degree)
        return cls(make_ckks_params(N=N, num_levels=num_levels,
                                    scale_bits=scale_bits, dnum=dnum,
                                    composite_degree=composite_degree,
                                    first_bits=fb))

    @property
    def scale(self) -> float:
        return float(1 << self.params.scale_bits)

    @property
    def cd(self) -> int:
        """Limbs dropped per rescale (composite scaling degree)."""
        return self.params.composite_degree

    def level_scale(self, num_limbs: int) -> float:
        """Deterministic target scale for ciphertexts with `num_limbs`
        remaining (FLEXIBLEAUTO: S_{l+1} = S_l^2 / q_block(l), the scale a
        product of two on-target ciphertexts lands on after one rescale --
        rns-leveledshe.cpp GetScalingFactorReal).  Keeping every
        ciphertext at a level on ONE scale makes additions exact; the
        drift is absorbed by plaintext-multiplication encode scales."""
        return _level_scales(self.params)[num_limbs]

    # -- keys ---------------------------------------------------------------
    def keygen(self, rng: np.random.Generator, h: int | None = None):
        """h: sparse-ternary Hamming weight (SPARSE_TERNARY secret, needed
        for bootstrapping's small sine range K)."""
        sk = rlwe.keygen(self.params, rng, h)
        pk = rlwe.pubkey_gen(self.params, sk, rng)
        return sk, pk

    def relin_key_gen(self, sk: rlwe.SecretKey, rng,
                      method: str = "hybrid",
                      digit_bits: int = 0) -> rlwe.EvalKey:
        """method: 'hybrid' (default, keyswitch-hybrid.cpp) or 'bv'
        (keyswitch-bv.cpp digit decomposition, relinWindow=digit_bits)."""
        mods = tuple(self.params.moduli)
        s = sk.eval_poly(mods)
        s2 = rns.mul(s, s)
        if method == "bv":
            return rlwe.bv_evk_gen(self.params, s2, sk, rng,
                                   digit_bits=digit_bits)
        return rlwe.evk_gen(self.params, s2, sk, rng)

    def rotation_key_gen(self, sk: rlwe.SecretKey, rots, rng,
                         method: str = "hybrid", digit_bits: int = 0
                         ) -> dict[int, rlwe.EvalKey]:
        """Keys for slot rotations (EvalRotateKeyGen); index r -> galois
        element 5^r mod 2N."""
        mods = tuple(self.params.moduli)
        N = self.params.N
        out = {}
        s = sk.eval_poly(mods)
        for r in rots:
            k = pow(5, r % (2 * N), 2 * N)
            s_k = rns.automorphism(s, k)
            if method == "bv":
                out[r] = rlwe.bv_evk_gen(self.params, s_k, sk, rng,
                                         digit_bits=digit_bits)
            else:
                out[r] = rlwe.evk_gen(self.params, s_k, sk, rng)
        return out

    def conj_key_gen(self, sk: rlwe.SecretKey, rng) -> rlwe.EvalKey:
        mods = tuple(self.params.moduli)
        N = self.params.N
        s_k = rns.automorphism(sk.eval_poly(mods), 2 * N - 1)
        return rlwe.evk_gen(self.params, s_k, sk, rng)

    # -- encode/encrypt -----------------------------------------------------
    def make_plaintext(self, z, level_mods: tuple | None = None,
                       scale: float | None = None,
                       slots: int | None = None) -> tuple[RnsPoly, float]:
        mods = level_mods or tuple(self.params.moduli)
        scale = scale or self.scale
        m = encode(z, self.params.N, scale, slots=slots)
        return rns.to_eval(rlwe.signed_to_rns(m, mods)), scale

    def encrypt(self, pk: rlwe.PublicKey, z, rng,
                slots: int | None = None) -> Ciphertext:
        """slots=s < N/2 encrypts sparsely packed (subring encoding)."""
        m, scale = self.make_plaintext(z, slots=slots)
        c0, c1 = rlwe.encrypt_pk(self.params, pk, m, rng)
        return Ciphertext(c0=c0, c1=c1, scale=scale)

    def decrypt(self, sk: rlwe.SecretKey, ct: Ciphertext,
                slots: int | None = None, sparse: bool = False,
                flood_rng: np.random.Generator | None = None,
                flood_sd: float = float(1 << 20)) -> np.ndarray:
        """Decrypt; if flood_rng is given, Gaussian noise of std flood_sd
        is added to the phase before decoding (NOISE_FLOODING_DECRYPT --
        the countermeasure for CKKS approximate-decryption key recovery,
        reference examples/CKKS_NOISE_FLOODING.md +
        UnitTestNoiseFlooding.cpp; the result must then be treated as
        public)."""
        ph = rlwe.decrypt_phase(sk, ct.c0, ct.c1)
        if flood_rng is not None:
            e = np.rint(flood_rng.normal(0.0, flood_sd,
                                         size=self.params.N)).astype(np.int64)
            ph = rns.add(ph, rlwe.signed_to_rns(e, ph.moduli, fmt=ph.fmt)
                         if ph.fmt == rns.COEFF else
                         rns.to_eval(rlwe.signed_to_rns(e, ph.moduli)))
        comps = ct.components()
        if len(comps) > 2:
            s = sk.eval_poly(ct.moduli)
            s_pow = rns.mul(s, s)
            for c in comps[2:]:
                ph = rns.add(ph, rns.to_coeff(rns.mul(c, s_pow)))
                s_pow = rns.mul(s_pow, s)
        big = rns.to_bigint(ph)
        Q = 1
        for q in ct.moduli:
            Q *= q
        m = _center(big, Q)
        return decode(m, self.params.N, ct.scale, slots, sparse=sparse)

    # -- leveled ops ----------------------------------------------------------
    def add(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        assert abs(a.scale - b.scale) < 1e-6 * a.scale and a.moduli == b.moduli
        return Ciphertext(rns.add(a.c0, b.c0), rns.add(a.c1, b.c1), a.scale)

    def sub(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        assert abs(a.scale - b.scale) < 1e-6 * a.scale and a.moduli == b.moduli
        return Ciphertext(rns.sub(a.c0, b.c0), rns.sub(a.c1, b.c1), a.scale)

    def add_plain(self, a: Ciphertext, z,
                  slots: int | None = None) -> Ciphertext:
        m, _ = self.make_plaintext(z, a.moduli, a.scale, slots=slots)
        return Ciphertext(rns.add(a.c0, m), a.c1, a.scale)

    def mul_plain(self, a: Ciphertext, z,
                  slots: int | None = None) -> Ciphertext:
        """Plaintext multiply.  The encode scale is chosen so that after
        the caller's rescale the result lands EXACTLY on the level target
        scale, absorbing any drift in a.scale (FLEXIBLEAUTO plaintext
        scale adjustment).  slots=s encodes the plaintext sparsely
        (period-s replicated slot vector)."""
        L = len(a.moduli)
        if L - self.cd >= self.cd:
            q_block = 1.0
            for q in a.moduli[-self.cd:]:
                q_block *= float(q)
            pt_scale = self.level_scale(L - self.cd) * q_block / a.scale
        else:
            pt_scale = self.scale
        m, sc = self.make_plaintext(z, a.moduli, pt_scale, slots=slots)
        return Ciphertext(rns.mul(a.c0, m), rns.mul(a.c1, m), a.scale * sc)

    def mul(self, a: Ciphertext, b: Ciphertext,
            evk: rlwe.EvalKey | None = None) -> Ciphertext:
        """Tensor product; relinearizes if evk given, else keeps c2."""
        assert a.moduli == b.moduli
        d0 = rns.mul(a.c0, b.c0)
        d1 = rns.add(rns.mul(a.c0, b.c1), rns.mul(a.c1, b.c0))
        d2 = rns.mul(a.c1, b.c1)
        scale = a.scale * b.scale
        if evk is None:
            return Ciphertext(d0, d1, scale, c2=d2)
        k0, k1 = rlwe.key_switch(self.params, evk, d2)
        return Ciphertext(rns.add(d0, k0), rns.add(d1, k1), scale)

    def square(self, a: Ciphertext, evk: rlwe.EvalKey) -> Ciphertext:
        return self.mul(a, a, evk)

    def mul_rescale(self, a: Ciphertext, b: Ciphertext, evk) -> Ciphertext:
        """Fused EvalMult + relinearize + rescale: the tensor product's
        d0/d1 are folded (scaled by P) into the key switch's extended-basis
        accumulators and ONE EVAL-domain basis change divides by
        P * (last composite-degree q-block) — no separate ModReduce
        COEFFICIENT round-trip (vs the reference's EvalMult followed by
        ModReduceInternal, rns-leveledshe.cpp:182-191 + :381).  `evk` may
        be an EvalKey or a PreparedEvalKey (Montgomery form, faster)."""
        assert a.moduli == b.moduli
        if a.c1 is b.c1 and a.c0 is b.c0:
            d0 = rns.mul(a.c0, a.c0)
            cross = rns.mul(a.c0, a.c1)
            d1 = rns.add(cross, cross)
            d2 = rns.mul(a.c1, a.c1)
        else:
            d0 = rns.mul(a.c0, b.c0)
            d1 = rns.add(rns.mul(a.c0, b.c1), rns.mul(a.c1, b.c0))
            d2 = rns.mul(a.c1, b.c1)
        scale = a.scale * b.scale
        k0, k1 = rlwe.key_switch_core(self.params, evk, d2,
                                      extra=(d0, d1), drop_q=self.cd)
        for qd in a.moduli[len(a.moduli) - self.cd:]:
            scale /= qd
        return Ciphertext(k0, k1, scale)

    def relin_keys_gen(self, sk: rlwe.SecretKey, rng,
                       max_degree: int = 3) -> dict[int, rlwe.EvalKey]:
        """EvalMultKeysGen (cryptocontext.h:1099): switching keys for
        s^2..s^max_degree, enabling relinearization of ciphertexts of any
        degree up to max_degree (EvalMultNoRelin chains)."""
        mods = tuple(self.params.moduli)
        s = sk.eval_poly(mods)
        out = {}
        s_pow = s
        for d in range(2, max_degree + 1):
            s_pow = rns.mul(s_pow, s)
            out[d] = rlwe.evk_gen(self.params, s_pow, sk, rng)
        return out

    def mul_no_relin(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        """EvalMultNoRelin for arbitrary input degrees: full component
        convolution (degree da + db); no key switch."""
        assert a.moduli == b.moduli
        ca, cb = a.components(), b.components()
        out = [None] * (len(ca) + len(cb) - 1)
        for i, x in enumerate(ca):
            for j, y in enumerate(cb):
                t = rns.mul(x, y)
                k = i + j
                out[k] = t if out[k] is None else rns.add(out[k], t)
        scale = a.scale * b.scale
        return Ciphertext(out[0], out[1], scale,
                          c2=out[2] if len(out) > 2 else None,
                          c_rest=tuple(out[3:]))

    def relinearize(self, a: Ciphertext,
                    evks: dict[int, rlwe.EvalKey] | rlwe.EvalKey
                    ) -> Ciphertext:
        """Relinearize (cryptocontext.h:2050): key-switch every component
        of degree >= 2 down onto (c0, c1) using the s^d keys from
        relin_keys_gen (a bare EvalKey is accepted for the degree-2-only
        case)."""
        comps = a.components()
        if len(comps) <= 2:
            return a
        if isinstance(evks, rlwe.EvalKey):
            evks = {2: evks}
        d0, d1 = comps[0], comps[1]
        for d, c in enumerate(comps[2:], start=2):
            k0, k1 = rlwe.key_switch(self.params, evks[d], c)
            d0 = rns.add(d0, k0)
            d1 = rns.add(d1, k1)
        return Ciphertext(d0, d1, a.scale)

    def mul_and_relinearize(self, a: Ciphertext, b: Ciphertext,
                            evks: dict[int, rlwe.EvalKey] | rlwe.EvalKey
                            ) -> Ciphertext:
        """EvalMultAndRelinearize: tensor product of ANY-degree inputs,
        then full relinearization back to degree 1."""
        return self.relinearize(self.mul_no_relin(a, b), evks)

    def rescale(self, a: Ciphertext) -> Ciphertext:
        """ModReduce: drop the last composite_degree limbs, divide the
        scale by their product (ckksrns-leveledshe.cpp:162-183; composite
        scaling drops the whole ~2^scale_bits block)."""
        c0, c1 = rns.to_coeff(a.c0), rns.to_coeff(a.c1)
        scale = a.scale
        for _ in range(self.cd):
            q_last = c0.moduli[-1]
            c0 = rns.drop_last_element_and_scale(c0)
            c1 = rns.drop_last_element_and_scale(c1)
            scale /= q_last
        return Ciphertext(rns.to_eval(c0), rns.to_eval(c1), scale)

    def rotate(self, a: Ciphertext, r: int,
               rot_keys: dict[int, rlwe.EvalKey]) -> Ciphertext:
        """EvalRotate: slot rotation by r via automorphism 5^r + keyswitch."""
        N = self.params.N
        k = pow(5, r % (2 * N), 2 * N)
        c0 = rns.automorphism(a.c0, k)
        c1 = rns.automorphism(a.c1, k)
        d0, d1 = rlwe.key_switch(self.params, rot_keys[r], c1)
        return Ciphertext(rns.add(c0, d0), d1, a.scale)

    def fast_rotation_precompute(self, a: Ciphertext) -> list:
        """EvalFastRotationPrecompute (cryptocontext.h / keyswitch-
        hybrid.cpp EvalKeySwitchPrecomputeCore): hoist the digit
        decomposition + ModUp of c1 once; every subsequent
        fast_rotation of this ciphertext reuses it."""
        return rlwe.key_switch_precompute(self.params, a.c1)

    def fast_rotation(self, a: Ciphertext, r: int,
                      rot_keys: dict[int, rlwe.EvalKey],
                      precomp: list) -> Ciphertext:
        """EvalFastRotation: automorphism applied to the hoisted EVAL
        digits (pure evaluation-point permutation), then only the inner
        products + ModDown run per rotation index."""
        if r == 0:
            return a
        N = self.params.N
        k = pow(5, r % (2 * N), 2 * N)
        digs = [rns.automorphism(u, k) for u in precomp]
        d0, d1 = rlwe.key_switch_apply(self.params, rot_keys[r], digs)
        c0 = rns.automorphism(a.c0, k)
        return Ciphertext(rns.add(c0, d0), d1, a.scale)

    def key_switch_ext(self, a: Ciphertext,
                       add_first: bool = True) -> Ciphertext:
        """KeySwitchExt (cryptocontext.h): represent P*ct over the
        extended basis Q_l + P so it can be ADDED to extended
        fast_rotation_ext partial sums.  add_first=False extends only c1
        (the c0 term is carried separately by the caller)."""
        c1 = rlwe.key_switch_ext_poly(self.params, a.c1)
        if add_first:
            c0 = rlwe.key_switch_ext_poly(self.params, a.c0)
        else:
            ext_mods = c1.moduli
            c0 = RnsPoly(jnp.zeros_like(c1.data), ext_mods, c1.fmt)
        return Ciphertext(c0, c1, a.scale)

    def key_switch_down(self, a: Ciphertext) -> Ciphertext:
        """KeySwitchDown: ModDown an extended (QP) ciphertext back to Q_l,
        dividing out the implicit P factor."""
        return Ciphertext(rlwe.key_switch_down_poly(self.params, a.c0),
                          rlwe.key_switch_down_poly(self.params, a.c1),
                          a.scale)

    def fast_rotation_ext(self, a: Ciphertext, r: int,
                          rot_keys: dict[int, rlwe.EvalKey],
                          precomp: list,
                          add_first: bool = True) -> Ciphertext:
        """EvalFastRotationExt (cryptocontext.h:2437; ckksrns-fhe.cpp uses
        it inside CoeffsToSlots): like fast_rotation but WITHOUT the final
        ModDown — the result lives over Q_l + P carrying a factor P.
        Sums of many such rotations (a BSGS inner loop) pay ONE ModDown
        via key_switch_down instead of one per rotation.

        add_first: include P*sigma_k(c0) in the extended c0 (pass False
        when the caller accumulates the c0 terms separately over Q)."""
        if r == 0:
            return self.key_switch_ext(a, add_first)
        N = self.params.N
        k = pow(5, r % (2 * N), 2 * N)
        digs = [rns.automorphism(u, k) for u in precomp]
        d0, d1 = rlwe.key_switch_inner(self.params, rot_keys[r], digs)
        if add_first:
            c0 = rlwe.key_switch_ext_poly(
                self.params, rns.automorphism(a.c0, k))
            d0 = rns.add(d0, c0)
        return Ciphertext(d0, d1, a.scale)

    def automorphism(self, a: Ciphertext, k: int,
                     evk: rlwe.EvalKey) -> Ciphertext:
        """EvalAutomorphism (cryptocontext.h:2278): raw galois map
        X -> X^k with its switching key (rotate/conjugate are the 5^r and
        2N-1 special cases)."""
        c0 = rns.automorphism(a.c0, k)
        c1 = rns.automorphism(a.c1, k)
        d0, d1 = rlwe.key_switch(self.params, evk, c1)
        return Ciphertext(rns.add(c0, d0), d1, a.scale)

    def automorphism_key_gen(self, sk: rlwe.SecretKey, ks, rng
                             ) -> dict[int, rlwe.EvalKey]:
        """EvalAutomorphismKeyGen: keys for raw galois elements."""
        mods = tuple(self.params.moduli)
        s = sk.eval_poly(mods)
        return {k: rlwe.evk_gen(self.params, rns.automorphism(s, k), sk,
                                rng) for k in ks}

    def conjugate(self, a: Ciphertext, conj_key: rlwe.EvalKey) -> Ciphertext:
        N = self.params.N
        k = 2 * N - 1
        c0 = rns.automorphism(a.c0, k)
        c1 = rns.automorphism(a.c1, k)
        d0, d1 = rlwe.key_switch(self.params, conj_key, c1)
        return Ciphertext(rns.add(c0, d0), d1, a.scale)
