"""RadixInt: arbitrary-precision encrypted integers over ShortInt limbs.

Reference semantics: /root/reference/src/binfhe/include/radix/radix.h
(RadixInt :99 -- little-endian limbs, 2-bit message + 2-bit carry, lazy
carry propagation; params :20-84 EUINT8..EUINT256/EADDRESS) and
lazy_carry.h (carry budget tracking, normalize when the headroom is
spent).

TPU re-architecture: ALL limbs of ALL integers in flight live in one
batched LweCiphertext, so every LUT pass (normalization round, limb
products, comparisons) is a single batched functional bootstrap -- the
per-limb loops of the reference become one [batch*limbs] blind rotation.
Only the carry ripple is sequential (num_limbs rounds).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..math.modmath import add_mod, u32
from .params import TfheParams
from . import lwe, funcboot, rgsw, shortint
from .shortint import ShortIntParams


@dataclasses.dataclass(frozen=True)
class RadixParams:
    limb: ShortIntParams
    num_limbs: int

    @property
    def total_bits(self) -> int:
        return self.limb.message_bits * self.num_limbs

    @property
    def max_value(self) -> int:
        return (1 << self.total_bits) - 1


# radix.h:38-88 -- fhEVM type presets (2-bit limbs, 2-bit carries)
EUINT4 = RadixParams(ShortIntParams(2, 2), 2)
EUINT8 = RadixParams(ShortIntParams(2, 2), 4)
EUINT16 = RadixParams(ShortIntParams(2, 2), 8)
EUINT32 = RadixParams(ShortIntParams(2, 2), 16)
EUINT64 = RadixParams(ShortIntParams(2, 2), 32)
EUINT128 = RadixParams(ShortIntParams(2, 2), 64)
EUINT256 = RadixParams(ShortIntParams(2, 2), 128)
EADDRESS = RadixParams(ShortIntParams(2, 2), 80)
EBOOL = RadixParams(ShortIntParams(2, 2), 1)


@dataclasses.dataclass
class RadixInt:
    """ct: batched LweCiphertext with trailing axis = num_limbs
    (little-endian); max_limb: host bound on any limb value (lazy-carry
    budget, lazy_carry.h CarryBudget)."""
    ct: lwe.LweCiphertext
    rp: RadixParams
    max_limb: int

    @property
    def batch_shape(self):
        return self.ct.b.shape[:-1]


def _limbs_of(values, rp: RadixParams) -> np.ndarray:
    vals = np.asarray(values, dtype=object).reshape(-1)
    m = rp.limb.msg_mod
    out = np.zeros((len(vals), rp.num_limbs), dtype=np.int64)
    for i, v in enumerate(vals):
        v = int(v) & rp.max_value
        for j in range(rp.num_limbs):
            out[i, j] = v % m
            v //= m
    return out


def encrypt(params: TfheParams, rp: RadixParams, sk, values,
            rng: np.random.Generator) -> RadixInt:
    vals = np.asarray(values)
    limbs = _limbs_of(vals, rp).reshape(vals.shape + (rp.num_limbs,))
    ct = shortint.encrypt(params, rp.limb, sk, limbs, rng)
    return RadixInt(ct=ct, rp=rp, max_limb=rp.limb.msg_mod - 1)


def trivial_encrypt(params: TfheParams, rp: RadixParams, values) -> RadixInt:
    """Noiseless "encryption" (a = 0): fhevm.cpp TrivialEncrypt."""
    vals = np.asarray(values)
    limbs = _limbs_of(vals, rp).reshape(vals.shape + (rp.num_limbs,))
    q, p = params.q, rp.limb.p
    b = (limbs.astype(np.uint64) * (q // p)) % q
    a = np.zeros(limbs.shape + (params.n,), dtype=np.uint32)
    return RadixInt(ct=lwe.LweCiphertext(jnp.asarray(a),
                                         jnp.asarray(b.astype(np.uint32)),
                                         q, p),
                    rp=rp, max_limb=rp.limb.msg_mod - 1)


def decrypt(params: TfheParams, rp: RadixParams, sk, x: RadixInt):
    limbs = shortint.decrypt(params, rp.limb, sk, x.ct)
    m = rp.limb.msg_mod
    # recompose little-endian; lazy carries are absorbed mod 2^total
    vals = np.zeros(limbs.shape[:-1], dtype=object)
    for j in range(rp.num_limbs):
        vals = vals + limbs[..., j].astype(object) * (m ** j)
    out = np.vectorize(lambda v: int(v) & rp.max_value, otypes=[object])(vals)
    return out


def propagate_carries(params: TfheParams, key: rgsw.BootstrapKey,
                      x: RadixInt, ntt_impl=None) -> RadixInt:
    """Full carry normalization: sequential ripple of (msg, carry) LUT
    splits; each round's two LUT evals are batched over the integers."""
    rp = x.rp
    sp = rp.limb
    tabs = shortint.luts(params, sp)
    ct = x.ct
    lead = ct.b.shape[:-1]
    out_a, out_b = [], []
    carry = None
    for j in range(rp.num_limbs):
        limb = lwe.LweCiphertext(ct.a[..., j, :], ct.b[..., j], ct.modulus,
                                 sp.p)
        if carry is not None:
            limb = lwe.add(limb, carry)
        msg = shortint.apply_lut(params, key, limb, tabs["msg"], sp, ntt_impl)
        if j + 1 < rp.num_limbs:
            carry = shortint.apply_lut(params, key, limb, tabs["carry"], sp,
                                       ntt_impl)
        out_a.append(msg.a)
        out_b.append(msg.b)
    new = lwe.LweCiphertext(jnp.stack(out_a, axis=-2),
                            jnp.stack(out_b, axis=-1), ct.modulus, sp.p)
    return RadixInt(ct=new, rp=rp, max_limb=sp.msg_mod - 1)


def _maybe_normalize(params, key, x: RadixInt, incoming: int,
                     ntt_impl=None) -> RadixInt:
    if x.max_limb + incoming >= x.rp.limb.p:
        return propagate_carries(params, key, x, ntt_impl)
    return x


def add(params: TfheParams, key: rgsw.BootstrapKey, a: RadixInt, b: RadixInt,
        ntt_impl=None) -> RadixInt:
    """Lazy addition: limb-wise LWE add; normalize only when the carry
    budget would overflow (lazy_carry.h:55-82)."""
    a = _maybe_normalize(params, key, a, b.max_limb, ntt_impl)
    if a.max_limb + b.max_limb >= a.rp.limb.p:
        b = propagate_carries(params, key, b, ntt_impl)
    return RadixInt(ct=lwe.add(a.ct, b.ct), rp=a.rp,
                    max_limb=a.max_limb + b.max_limb)


def sub(params: TfheParams, key: rgsw.BootstrapKey, a: RadixInt, b: RadixInt,
        ntt_impl=None) -> RadixInt:
    """a - b = a + ~b + 1 (two's complement on the message space).

    ~b needs carry-free b; the +1 is a trivial add to limb 0."""
    rp = a.rp
    sp = rp.limb
    if b.max_limb >= sp.msg_mod:
        b = propagate_carries(params, key, b, ntt_impl)
    tabs = shortint.luts(params, sp)
    nb = shortint.apply_lut(params, key, b.ct, tabs["not"], sp, ntt_impl)
    if a.max_limb + sp.msg_mod >= sp.p:
        a = propagate_carries(params, key, a, ntt_impl)
    s = lwe.add(a.ct, nb)
    # +1 to limb 0
    q, p = params.q, sp.p
    one = np.zeros(rp.num_limbs, dtype=np.uint32)
    one[0] = q // p
    b_new = add_mod(s.b, jnp.asarray(one), q)
    out = RadixInt(ct=lwe.LweCiphertext(s.a, b_new, q, p), rp=rp,
                   max_limb=a.max_limb + sp.msg_mod)
    return propagate_carries(params, key, out, ntt_impl)


def mul(params: TfheParams, key: rgsw.BootstrapKey, a: RadixInt, b: RadixInt,
        ntt_impl=None) -> RadixInt:
    """Schoolbook limb multiplication: ALL partial products (lo and hi)
    evaluate in ONE batched bootstrap each, then scatter-add by position
    and normalize (radix.h Mul :240-283)."""
    rp = a.rp
    sp = rp.limb
    m = sp.msg_mod
    L = rp.num_limbs
    a = _maybe_normalize(params, key, a, sp.p, ntt_impl)
    b = _maybe_normalize(params, key, b, sp.p, ntt_impl)
    if a.max_limb >= m:
        a = propagate_carries(params, key, a, ntt_impl)
    if b.max_limb >= m:
        b = propagate_carries(params, key, b, ntt_impl)
    tabs = shortint.luts(params, sp)

    pairs = [(i, j) for i in range(L) for j in range(L) if i + j < L]
    ct = a.ct
    q = ct.modulus

    def limb(x: RadixInt, j):
        return lwe.LweCiphertext(x.ct.a[..., j, :], x.ct.b[..., j], q, sp.p)

    packed_a = jnp.stack([limb(a, i).a for i, j in pairs], axis=-2)
    packed_ab = jnp.stack([limb(a, i).b for i, j in pairs], axis=-1)
    packed_ba = jnp.stack([limb(b, j).a for i, j in pairs], axis=-2)
    packed_bb = jnp.stack([limb(b, j).b for i, j in pairs], axis=-1)
    cta = lwe.LweCiphertext(packed_a, packed_ab, q, sp.p)
    ctb = lwe.LweCiphertext(packed_ba, packed_bb, q, sp.p)
    x = shortint.pack(sp, cta, ctb)
    lo = shortint.apply_lut(params, key, x, tabs["mul_lo"], sp, ntt_impl)
    hi = shortint.apply_lut(params, key, x, tabs["mul_hi"], sp, ntt_impl)

    # scatter-add partial products by position, normalizing between groups
    # so no limb ever exceeds the (message+carry) space: after a normalize
    # limbs are < m, and each group adds at most `group` products < m each.
    terms = []        # (position, idx, which) with which in {lo, hi}
    for idx, (i, j) in enumerate(pairs):
        terms.append((i + j, idx, lo))
        if i + j + 1 < L:
            terms.append((i + j + 1, idx, hi))
    group = (sp.p - sp.msg_mod) // (sp.msg_mod - 1)   # products per round
    acc = None
    for g0 in range(0, len(terms), group):
        acc_a = jnp.zeros_like(ct.a) if acc is None else acc.ct.a
        acc_b = jnp.zeros_like(ct.b) if acc is None else acc.ct.b
        added = 0
        for (k, idx, src) in terms[g0:g0 + group]:
            acc_a = acc_a.at[..., k, :].set(add_mod(acc_a[..., k, :],
                                                    src.a[..., idx, :], q))
            acc_b = acc_b.at[..., k].set(add_mod(acc_b[..., k],
                                                 src.b[..., idx], q))
            added += 1
        acc = RadixInt(ct=lwe.LweCiphertext(acc_a, acc_b, q, sp.p), rp=rp,
                       max_limb=(0 if acc is None else 0) + sp.msg_mod - 1
                       + added * (m - 1))
        acc = propagate_carries(params, key, acc, ntt_impl)
    return acc


def compare(params: TfheParams, key: rgsw.BootstrapKey, op: str,
            a: RadixInt, b: RadixInt, ntt_impl=None) -> lwe.LweCiphertext:
    """eq/ne/lt/le/gt/ge -> encrypted bool (comparison_luts.h semantics:
    MSB-first lexicographic fold)."""
    rp = a.rp
    sp = rp.limb
    if a.max_limb >= sp.msg_mod:
        a = propagate_carries(params, key, a, ntt_impl)
    if b.max_limb >= sp.msg_mod:
        b = propagate_carries(params, key, b, ntt_impl)
    tabs = shortint.luts(params, sp)
    q = a.ct.modulus
    L = rp.num_limbs

    if op in ("eq", "ne"):
        # batched limb equality, sum, then one LUT on (sum == L)
        bits = shortint.binary_op(params, key, "eq",
                                  a.ct, b.ct, sp, ntt_impl)
        tot_a = bits.a[..., 0, :]
        tot_b = bits.b[..., 0]
        for j in range(1, L):
            tot_a = add_mod(tot_a, bits.a[..., j, :], q)
            tot_b = add_mod(tot_b, bits.b[..., j], q)
        tot = lwe.LweCiphertext(tot_a, tot_b, q, sp.p)
        want = op == "eq"   # L < p holds for all supported limb sums
        lut = funcboot.generate_lut(
            lambda x, pp: int((x == L) == want), sp.p, params.q)
        return shortint.apply_lut(params, key, tot, lut, sp, ntt_impl)

    # lexicographic fold: cmp_j in {0 eq, 1 lt, 2 gt} per limb (batched),
    # then sequential MSB->LSB merge r' = (r != 0) ? r : cmp_j
    cmp_lut = funcboot.generate_lut(
        lambda x, pp: (0 if (x % 4) == ((x // 4) % 4)
                       else (1 if (x % 4) < ((x // 4) % 4) else 2)),
        sp.p, params.q)
    x = shortint.pack(sp, a.ct, b.ct)
    cmps = shortint.apply_lut(params, key, x, cmp_lut, sp, ntt_impl)
    merge_lut = funcboot.generate_lut(
        lambda x, pp: (x % 4) if (x % 4) != 0 else ((x // 4) % 4),
        sp.p, params.q)
    r = lwe.LweCiphertext(cmps.a[..., L - 1, :], cmps.b[..., L - 1], q, sp.p)
    for j in reversed(range(L - 1)):
        nxt = lwe.LweCiphertext(cmps.a[..., j, :], cmps.b[..., j], q, sp.p)
        packed = shortint.pack(sp, r, nxt)
        r = shortint.apply_lut(params, key, packed, merge_lut, sp, ntt_impl)
    final = {
        "lt": lambda v: int(v == 1), "gt": lambda v: int(v == 2),
        "le": lambda v: int(v != 2), "ge": lambda v: int(v != 1),
    }[op]
    lut = funcboot.generate_lut(lambda x, pp: final(x % 4), sp.p, params.q)
    return shortint.apply_lut(params, key, r, lut, sp, ntt_impl)


def bitwise(params: TfheParams, key: rgsw.BootstrapKey, op: str,
            a: RadixInt, b: RadixInt, ntt_impl=None) -> RadixInt:
    """and/or/xor: one batched packed LUT over all limbs."""
    sp = a.rp.limb
    if a.max_limb >= sp.msg_mod:
        a = propagate_carries(params, key, a, ntt_impl)
    if b.max_limb >= sp.msg_mod:
        b = propagate_carries(params, key, b, ntt_impl)
    out = shortint.binary_op(params, key, op, a.ct, b.ct, sp, ntt_impl)
    return RadixInt(ct=out, rp=a.rp, max_limb=sp.msg_mod - 1)


def bit_not(params: TfheParams, key: rgsw.BootstrapKey, a: RadixInt,
            ntt_impl=None) -> RadixInt:
    sp = a.rp.limb
    if a.max_limb >= sp.msg_mod:
        a = propagate_carries(params, key, a, ntt_impl)
    tabs = shortint.luts(params, sp)
    out = shortint.apply_lut(params, key, a.ct, tabs["not"], sp, ntt_impl)
    return RadixInt(ct=out, rp=a.rp, max_limb=sp.msg_mod - 1)


def select(params: TfheParams, key: rgsw.BootstrapKey,
           cond: lwe.LweCiphertext, a: RadixInt, b: RadixInt,
           ntt_impl=None) -> RadixInt:
    """cond ? a : b = b + cond*(a - b) (fhevm Select)."""
    rp = a.rp
    sp = rp.limb
    d = sub(params, key, a, b, ntt_impl)            # carry-free
    # broadcast cond against every limb, then packed multiply
    L = rp.num_limbs
    ca = jnp.broadcast_to(cond.a[..., None, :], d.ct.a.shape)
    cb = jnp.broadcast_to(cond.b[..., None], d.ct.b.shape)
    cond_l = lwe.LweCiphertext(ca, cb, cond.modulus, sp.p)
    prod = shortint.binary_op(params, key, "mul_lo", d.ct, cond_l, sp,
                              ntt_impl)
    out = RadixInt(ct=lwe.add(b.ct if b.max_limb < sp.msg_mod else
                              propagate_carries(params, key, b, ntt_impl).ct,
                              prod), rp=rp,
                   max_limb=2 * (sp.msg_mod - 1))
    return propagate_carries(params, key, out, ntt_impl)


def cast(params: TfheParams, x: RadixInt, rp_to: RadixParams) -> RadixInt:
    """Truncate or zero-extend limbs (fhevm Cast)."""
    L_from, L_to = x.rp.num_limbs, rp_to.num_limbs
    q = x.ct.modulus
    if L_to <= L_from:
        return RadixInt(ct=lwe.LweCiphertext(x.ct.a[..., :L_to, :],
                                             x.ct.b[..., :L_to], q,
                                             x.ct.pt_mod),
                        rp=rp_to, max_limb=x.max_limb)
    pad_a = jnp.zeros(x.ct.a.shape[:-2] + (L_to - L_from, x.ct.a.shape[-1]),
                      dtype=x.ct.a.dtype)
    pad_b = jnp.zeros(x.ct.b.shape[:-1] + (L_to - L_from,), dtype=x.ct.b.dtype)
    return RadixInt(ct=lwe.LweCiphertext(
        jnp.concatenate([x.ct.a, pad_a], axis=-2),
        jnp.concatenate([x.ct.b, pad_b], axis=-1), q, x.ct.pt_mod),
        rp=rp_to, max_limb=x.max_limb)
