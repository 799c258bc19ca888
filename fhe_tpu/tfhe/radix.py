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
    """Full carry normalization.  Dispatches between the sequential
    ripple (cheap for few limbs: 2L LUT passes of batch B) and the
    Kogge-Stone parallel prefix (euint256.h:9 -- O(log L) depth:
    5 + ceil(log2 L) LUT passes of batch B*L, the TPU-native shape)."""
    if x.rp.num_limbs >= _KS_THRESHOLD:
        return propagate_carries_ks(params, key, x, ntt_impl)
    return propagate_carries_ripple(params, key, x, ntt_impl)


# Below this limb count the ripple's smaller total bootstrap work beats
# the prefix scan's fewer-but-wider passes (crossover ~8 on both the CPU
# mesh and one TPU chip; override via env for experiments).
import os as _os
_KS_THRESHOLD = int(_os.environ.get("FHE_RADIX_KS_THRESHOLD", "8"))


def propagate_carries_ripple(params: TfheParams, key: rgsw.BootstrapKey,
                             x: RadixInt, ntt_impl=None) -> RadixInt:
    """Sequential ripple of (msg, carry) LUT
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


def _shift_limbs_up(ct: lwe.LweCiphertext, d: int, p: int
                    ) -> lwe.LweCiphertext:
    """limb_j -> limb_{j+d}; the bottom d limbs become trivial zeros."""
    sh_a = jnp.concatenate([jnp.zeros_like(ct.a[..., :d, :]),
                            ct.a[..., :-d, :]], axis=-2)
    sh_b = jnp.concatenate([jnp.zeros_like(ct.b[..., :d]),
                            ct.b[..., :-d]], axis=-1)
    return lwe.LweCiphertext(sh_a, sh_b, ct.modulus, p)


def propagate_carries_ks(params: TfheParams, key: rgsw.BootstrapKey,
                         x: RadixInt, ntt_impl=None) -> RadixInt:
    """Kogge-Stone parallel-prefix normalization (the reference's
    koggeStoneCarries, euint256.h:408/:867, re-shaped for the TPU).

    The reference runs 3 prefix rounds over 8 boolean (generate,
    propagate) word pairs.  Here every round is ONE batched LUT
    bootstrap over all L limbs of all integers in flight:

      1. split    v_j -> (msg_j, car_j)               [2 LUT passes]
      2. s_j = msg_j + car_{j-1}   (plain add; s < 2m when
         carry_bits <= message_bits, so the residual carry is binary)
      3. generate g_j = [s_j >= m], propagate p_j = [s_j == m-1]
         as SEPARATE boolean ciphertexts                [2 passes]
      4. ceil(log2 L) Kogge-Stone rounds combining (g, p) pairs:
         g'' = g | (p & g_lo), p'' = p & p_lo.  Each AND/OR is a LUT
         on the PLAIN SUM of two fresh booleans (noise sqrt(2)*sigma;
         a packed-pair LUT would scale one operand's noise by m and
         overflow the tight radix paramsets).  The two AND LUTs of a
         round batch into one [2L]-lane pass             [2/round]
      5. cin = shift(g); out = (s + cin) mod m          [1 pass]

    Total 5 + 2*ceil(log2 L) LUT passes vs the ripple's 2L; every pass
    is one batched blind rotation over all limbs of all integers."""
    rp = x.rp
    sp = rp.limb
    m = sp.msg_mod
    L = rp.num_limbs
    assert sp.p // m <= m, "Kogge-Stone needs carry_bits <= message_bits"
    if L == 1:
        return propagate_carries_ripple(params, key, x, ntt_impl)
    tabs = shortint.luts(params, sp)
    ct = x.ct
    q = ct.modulus
    msg = shortint.apply_lut(params, key, ct, tabs["msg"], sp, ntt_impl)
    car = shortint.apply_lut(params, key, ct, tabs["carry"], sp, ntt_impl)
    s = lwe.add(msg, _shift_limbs_up(car, 1, sp.p))
    gen_lut = funcboot.generate_lut(lambda v, pp: int(v >= m), sp.p,
                                    params.q)
    prop_lut = funcboot.generate_lut(lambda v, pp: int(v == m - 1), sp.p,
                                     params.q)
    and_lut = funcboot.generate_lut(lambda v, pp: int(v == 2), sp.p,
                                    params.q)
    or_lut = funcboot.generate_lut(lambda v, pp: int(v >= 1), sp.p,
                                   params.q)
    g = shortint.apply_lut(params, key, s, gen_lut, sp, ntt_impl)
    p = shortint.apply_lut(params, key, s, prop_lut, sp, ntt_impl)
    d = 1
    while d < L:
        # one [2L]-lane pass: u = p & g_{j-d}  |  p'' = p & p_{j-d}
        u_in = lwe.add(p, _shift_limbs_up(g, d, sp.p))
        w_in = lwe.add(p, _shift_limbs_up(p, d, sp.p))
        both = lwe.LweCiphertext(
            jnp.concatenate([u_in.a, w_in.a], axis=-2),
            jnp.concatenate([u_in.b, w_in.b], axis=-1), q, sp.p)
        both = shortint.apply_lut(params, key, both, and_lut, sp, ntt_impl)
        u = lwe.LweCiphertext(both.a[..., :L, :], both.b[..., :L], q, sp.p)
        p = lwe.LweCiphertext(both.a[..., L:, :], both.b[..., L:], q, sp.p)
        g = shortint.apply_lut(params, key, lwe.add(g, u), or_lut, sp,
                               ntt_impl)
        d *= 2
    out = lwe.add(s, _shift_limbs_up(g, 1, sp.p))
    out = shortint.apply_lut(params, key, out, tabs["msg"], sp, ntt_impl)
    return RadixInt(ct=out, rp=rp, max_limb=sp.msg_mod - 1)


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
    """Limb multiplication: ALL partial products (lo and hi) evaluate in
    ONE batched bootstrap each (radix.h Mul :240-283), then a carry-save
    (Wallace-tree) reduction sums the product columns in O(log L) LUT
    rounds, finishing with one Kogge-Stone normalize.

    The reference cuts PBS COUNT with Karatsuba (euint256.h:10, ~64 vs
    256 PBS); on TPU the PBS count is batch width (throughput-free up to
    HBM limits) and the cost driver is sequential DEPTH, which the
    column reduction cuts from O(L^2 / carry_headroom) normalize rounds
    to O(log L) batched passes."""
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

    # --- carry-save column reduction -------------------------------
    # Host-side plan: place every partial product into the first free
    # row of its column -> a [rows, L] tensor of limb ciphertexts
    # (trivial zeros pad the triangle).  Every row value stays < m.
    terms = []        # (position, idx, src) with src in {lo, hi}
    for idx, (i, j) in enumerate(pairs):
        terms.append((i + j, idx, lo))
        if i + j + 1 < L:
            terms.append((i + j + 1, idx, hi))
    return _carry_save_reduce(params, key, rp, terms, a.ct, ntt_impl)


def _carry_save_reduce(params: TfheParams, key: rgsw.BootstrapKey,
                       rp: RadixParams, terms, ref_ct: lwe.LweCiphertext,
                       ntt_impl=None) -> RadixInt:
    """Wallace-tree column reduction shared by mul / mul_scalar.

    terms: list of (position, idx, src) where src is an LweCiphertext
    whose limb axis is indexed by idx; every term value is < msg_mod.
    ref_ct supplies the batch shape / dtypes."""
    sp = rp.limb
    m = sp.msg_mod
    L = rp.num_limbs
    ct = ref_ct
    q = ct.modulus
    counts = [0] * L
    placed = []       # (row, position, idx, src)
    for (k, idx, src) in terms:
        placed.append((counts[k], k, idx, src))
        counts[k] += 1
    rows = max(counts)
    lead = ct.b.shape[:-1]
    acc_a = jnp.zeros(lead + (rows, L, ct.a.shape[-1]), dtype=ct.a.dtype)
    acc_b = jnp.zeros(lead + (rows, L), dtype=ct.b.dtype)
    for (r, k, idx, src) in placed:
        acc_a = acc_a.at[..., r, k, :].set(src.a[..., idx, :])
        acc_b = acc_b.at[..., r, k].set(src.b[..., idx])

    cap = (sp.p - 1) // (m - 1)     # rows addable without overflow
    tabs = shortint.luts(params, sp)
    while rows > cap:
        # add rows in chunks of `cap` (plain adds), then split each
        # chunk sum into (msg, carry<<1) with two batched LUT passes
        r2 = (rows + cap - 1) // cap
        sum_a = jnp.zeros(lead + (r2, L, acc_a.shape[-1]), dtype=acc_a.dtype)
        sum_b = jnp.zeros(lead + (r2, L), dtype=acc_b.dtype)
        for g in range(r2):
            chunk = slice(g * cap, min((g + 1) * cap, rows))
            ca = acc_a[..., chunk, :, :]
            cb = acc_b[..., chunk, :]
            red_a, red_b = ca[..., 0, :, :], cb[..., 0, :]
            for r in range(1, ca.shape[-3]):
                red_a = add_mod(red_a, ca[..., r, :, :], q)
                red_b = add_mod(red_b, cb[..., r, :], q)
            sum_a = sum_a.at[..., g, :, :].set(red_a)
            sum_b = sum_b.at[..., g, :].set(red_b)
        sums = lwe.LweCiphertext(sum_a, sum_b, q, sp.p)
        msgs = shortint.apply_lut(params, key, sums, tabs["msg"], sp,
                                  ntt_impl)
        cars = shortint.apply_lut(params, key, sums, tabs["carry"], sp,
                                  ntt_impl)
        cars = _shift_limbs_up(cars, 1, sp.p)
        acc_a = jnp.concatenate([msgs.a, cars.a], axis=-3)
        acc_b = jnp.concatenate([msgs.b, cars.b], axis=-2)
        rows = 2 * r2

    red_a, red_b = acc_a[..., 0, :, :], acc_b[..., 0, :]
    for r in range(1, rows):
        red_a = add_mod(red_a, acc_a[..., r, :, :], q)
        red_b = add_mod(red_b, acc_b[..., r, :], q)
    out = RadixInt(ct=lwe.LweCiphertext(red_a, red_b, q, sp.p), rp=rp,
                   max_limb=min(rows, cap) * (m - 1))
    return propagate_carries(params, key, out, ntt_impl)


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


def min_(params: TfheParams, key: rgsw.BootstrapKey, a: RadixInt,
         b: RadixInt, ntt_impl=None) -> RadixInt:
    """fhevm.h:9 Min: lt-compare then select."""
    c = compare(params, key, "lt", a, b, ntt_impl)
    return select(params, key, c, a, b, ntt_impl)


def max_(params: TfheParams, key: rgsw.BootstrapKey, a: RadixInt,
         b: RadixInt, ntt_impl=None) -> RadixInt:
    c = compare(params, key, "lt", a, b, ntt_impl)
    return select(params, key, c, b, a, ntt_impl)


def _scale2(ct: lwe.LweCiphertext) -> lwe.LweCiphertext:
    """Homomorphic doubling (value and noise both x2)."""
    return lwe.add(ct, ct)


def _split_after_double(params, key, x: RadixInt, roll: bool,
                        ntt_impl) -> RadixInt:
    """After doubling carry-free limbs (v <= 6), one (msg, carry) split
    re-normalizes WITHOUT a prefix scan: carries are binary and cannot
    re-generate (msg of an even v is 0 or 2)."""
    sp = x.rp.limb
    tabs = shortint.luts(params, sp)
    msg = shortint.apply_lut(params, key, x.ct, tabs["msg"], sp, ntt_impl)
    car = shortint.apply_lut(params, key, x.ct, tabs["carry"], sp, ntt_impl)
    if roll:
        car = lwe.LweCiphertext(jnp.roll(car.a, 1, axis=-2),
                                jnp.roll(car.b, 1, axis=-1),
                                car.modulus, sp.p)
    else:
        car = _shift_limbs_up(car, 1, sp.p)
    out = lwe.add(msg, car)
    return RadixInt(ct=out, rp=x.rp, max_limb=sp.msg_mod - 1)


def _limb_shift(x: RadixInt, k: int, rotate: bool) -> RadixInt:
    """Plain limb-axis shift (zero-fill) or rotation, no LUTs."""
    L = x.rp.num_limbs
    ct = x.ct
    if rotate:
        k %= L
        a = jnp.roll(ct.a, k, axis=-2)
        b = jnp.roll(ct.b, k, axis=-1)
    elif k >= 0:
        sh = _shift_limbs_up(ct, k, ct.pt_mod) if k else ct
        a, b = sh.a, sh.b
    else:
        k = -k
        a = jnp.concatenate([ct.a[..., k:, :],
                             jnp.zeros_like(ct.a[..., :k, :])], axis=-2)
        b = jnp.concatenate([ct.b[..., k:],
                             jnp.zeros_like(ct.b[..., :k])], axis=-1)
    return RadixInt(ct=lwe.LweCiphertext(a, b, ct.modulus, ct.pt_mod),
                    rp=x.rp, max_limb=x.max_limb)


def shift_left(params: TfheParams, key: rgsw.BootstrapKey, x: RadixInt,
               k: int, ntt_impl=None, rotate: bool = False) -> RadixInt:
    """Shl/Rotl by a PLAINTEXT bit count (fhevm.h:10).  Whole-limb part
    is a free tensor shift; an odd bit doubles every limb then does one
    scan-free (msg, carry) split."""
    sp = x.rp.limb
    bits_per_limb = sp.message_bits
    if x.max_limb >= sp.msg_mod:
        x = propagate_carries(params, key, x, ntt_impl)
    if not rotate:
        k = min(k, x.rp.total_bits)
    out = _limb_shift(x, k // bits_per_limb, rotate)
    for _ in range(k % bits_per_limb):
        out = RadixInt(ct=_scale2(out.ct), rp=out.rp,
                       max_limb=2 * out.max_limb)
        out = _split_after_double(params, key, out, rotate, ntt_impl)
    return out


def shift_right(params: TfheParams, key: rgsw.BootstrapKey, x: RadixInt,
                k: int, ntt_impl=None, rotate: bool = False) -> RadixInt:
    """Shr/Rotr by a plaintext bit count: whole-limb tensor shift plus,
    per odd bit, out_j = (limb_j >> 1) + 2*(limb_{j+1} & 1) — two
    batched LUT passes, carry-free by construction."""
    sp = x.rp.limb
    bits_per_limb = sp.message_bits
    m = sp.msg_mod
    if x.max_limb >= m:
        x = propagate_carries(params, key, x, ntt_impl)
    if not rotate:
        k = min(k, x.rp.total_bits)
    out = _limb_shift(x, -(k // bits_per_limb), rotate=False) \
        if not rotate else _limb_shift(x, -(k // bits_per_limb), rotate=True)
    half_lut = funcboot.generate_lut(lambda v, pp: (v % m) >> 1, sp.p,
                                     params.q)
    lsb_lut = funcboot.generate_lut(lambda v, pp: (v % m) & 1, sp.p,
                                    params.q)
    for _ in range(k % bits_per_limb):
        half = shortint.apply_lut(params, key, out.ct, half_lut, sp,
                                  ntt_impl)
        lsb = shortint.apply_lut(params, key, out.ct, lsb_lut, sp, ntt_impl)
        hi = _scale2(lsb)
        if rotate:
            hi = lwe.LweCiphertext(jnp.roll(hi.a, -1, axis=-2),
                                   jnp.roll(hi.b, -1, axis=-1),
                                   hi.modulus, sp.p)
        else:
            L = out.rp.num_limbs
            hi = lwe.LweCiphertext(
                jnp.concatenate([hi.a[..., 1:, :],
                                 jnp.zeros_like(hi.a[..., :1, :])], axis=-2),
                jnp.concatenate([hi.b[..., 1:],
                                 jnp.zeros_like(hi.b[..., :1])], axis=-1),
                hi.modulus, sp.p)
        out = RadixInt(ct=lwe.add(half, hi), rp=out.rp,
                       max_limb=m - 1)
    return out


def _extract_bit(params, key, x: RadixInt, i: int,
                 ntt_impl) -> lwe.LweCiphertext:
    """Encrypted bit i of a carry-free RadixInt (LUT on its limb)."""
    sp = x.rp.limb
    j, b = divmod(i, sp.message_bits)
    lut = funcboot.generate_lut(
        lambda v, pp: (v >> b) & 1, sp.p, params.q)
    limb = lwe.LweCiphertext(x.ct.a[..., j, :], x.ct.b[..., j],
                             x.ct.modulus, sp.p)
    return shortint.apply_lut(params, key, limb, lut, sp, ntt_impl)


def divrem(params: TfheParams, key: rgsw.BootstrapKey, a: RadixInt,
           b: RadixInt, ntt_impl=None) -> tuple:
    """Encrypted-divisor division (fhevm.h:8 div/rem): binary restoring
    long division, MSB first — R = 2R + a_i; q_i = [R >= b];
    R -= q_i * b.  Deep by nature (total_bits sequential rounds, like
    the reference's normalize-then-divide); each round's compare/select
    is fully limb-batched.  Division by zero yields q = all-ones,
    r = a (the EVM convention is handled by the caller)."""
    rp = a.rp
    sp = rp.limb
    if a.max_limb >= sp.msg_mod:
        a = propagate_carries(params, key, a, ntt_impl)
    if b.max_limb >= sp.msg_mod:
        b = propagate_carries(params, key, b, ntt_impl)
    nbits = rp.total_bits
    r = trivial_encrypt(params, rp, np.zeros(a.batch_shape, dtype=np.int64))
    qbits = []
    for i in reversed(range(nbits)):
        r = shift_left(params, key, r, 1, ntt_impl)
        bit = _extract_bit(params, key, a, i, ntt_impl)
        # add the bit into limb 0 (carry-free: limb0 is even after shl)
        r0a = add_mod(r.ct.a[..., 0, :], bit.a, r.ct.modulus)
        r0b = add_mod(r.ct.b[..., 0], bit.b, r.ct.modulus)
        r = RadixInt(ct=lwe.LweCiphertext(
            r.ct.a.at[..., 0, :].set(r0a), r.ct.b.at[..., 0].set(r0b),
            r.ct.modulus, sp.p), rp=rp, max_limb=sp.msg_mod - 1)
        ge = compare(params, key, "ge", r, b, ntt_impl)
        rsub = sub(params, key, r, b, ntt_impl)
        r = select(params, key, ge, rsub, r, ntt_impl)
        qbits.append((i, ge))
    # assemble quotient limbs from the bit ciphertexts (scale bit by 2^pos)
    q = trivial_encrypt(params, rp, np.zeros(a.batch_shape, dtype=np.int64))
    qa, qb = q.ct.a, q.ct.b
    for (i, bit) in qbits:
        j, pos = divmod(i, sp.message_bits)
        sa, sb = bit.a, bit.b
        for _ in range(pos):
            sa = add_mod(sa, sa, q.ct.modulus)
            sb = add_mod(sb, sb, q.ct.modulus)
        qa = qa.at[..., j, :].set(add_mod(qa[..., j, :], sa, q.ct.modulus))
        qb = qb.at[..., j].set(add_mod(qb[..., j], sb, q.ct.modulus))
    qr = RadixInt(ct=lwe.LweCiphertext(qa, qb, q.ct.modulus, sp.p), rp=rp,
                  max_limb=sp.msg_mod - 1)
    return qr, r


def neg(params: TfheParams, key: rgsw.BootstrapKey, a: RadixInt,
        ntt_impl=None) -> RadixInt:
    """Two's-complement negation (fhevm.h Neg; radix.cpp NegateInPlace
    :248-252 does NOT+1 — here it is one `sub` from trivial zero)."""
    zero = trivial_encrypt(params, a.rp,
                           np.zeros(a.batch_shape, dtype=np.int64))
    return sub(params, key, zero, a, ntt_impl)


def is_zero(params: TfheParams, key: rgsw.BootstrapKey, a: RadixInt,
            ntt_impl=None) -> lwe.LweCiphertext:
    """fhevm.h IsZero (the reference's radix::IsNonZero is a stub,
    radix.cpp:497-509; this is a real batched implementation): encrypted
    bool [a == 0] via the limb-equality fold against trivial zero."""
    zero = trivial_encrypt(params, a.rp,
                           np.zeros(a.batch_shape, dtype=np.int64))
    return compare(params, key, "eq", a, zero, ntt_impl)


def is_nonzero(params: TfheParams, key: rgsw.BootstrapKey, a: RadixInt,
               ntt_impl=None) -> lwe.LweCiphertext:
    zero = trivial_encrypt(params, a.rp,
                           np.zeros(a.batch_shape, dtype=np.int64))
    return compare(params, key, "ne", a, zero, ntt_impl)


def _trivial_scalar(params: TfheParams, like: RadixInt, scalar) -> RadixInt:
    """Broadcast a host scalar to a trivial RadixInt of like's shape."""
    vals = np.empty(like.batch_shape, dtype=object)
    vals[...] = int(scalar)
    return trivial_encrypt(params, like.rp, vals)


def add_scalar(params: TfheParams, key: rgsw.BootstrapKey, a: RadixInt,
               scalar, ntt_impl=None) -> RadixInt:
    """fhevm.h AddScalar: trivial-encrypt the scalar limbs, then the
    ordinary lazy add (radix.cpp AddScalarInPlace:195)."""
    return add(params, key, a, _trivial_scalar(params, a, scalar), ntt_impl)


def sub_scalar(params: TfheParams, key: rgsw.BootstrapKey, a: RadixInt,
               scalar, ntt_impl=None) -> RadixInt:
    return sub(params, key, a, _trivial_scalar(params, a, scalar), ntt_impl)


def mul_scalar(params: TfheParams, key: rgsw.BootstrapKey, a: RadixInt,
               scalar, ntt_impl=None) -> RadixInt:
    """fhevm.h MulScalar (the reference's MulScalarInPlace is an empty
    placeholder, radix.cpp:240-245 — this is a real implementation).

    The scalar's limbs are KNOWN, so partial products are UNARY LUTs of
    a's limbs: at most one (lo, hi) batched LUT pair per distinct
    nonzero scalar limb value (s=1 rows are free copies), then the same
    carry-save column reduction as `mul`."""
    rp = a.rp
    sp = rp.limb
    m = sp.msg_mod
    L = rp.num_limbs
    if a.max_limb >= m:
        a = propagate_carries(params, key, a, ntt_impl)
    s_limbs = [int(v) for v in
               _limbs_of(np.asarray([int(scalar)], dtype=object), rp)[0]]
    # one batched (lo, hi) LUT pair per distinct scalar limb value >= 2
    lut_out = {}
    for s in sorted(set(s_limbs)):
        if s < 2:
            continue
        lo_lut = funcboot.generate_lut(lambda v, pp, s=s: (v % m) * s % m,
                                       sp.p, params.q)
        hi_lut = funcboot.generate_lut(lambda v, pp, s=s: (v % m) * s // m,
                                       sp.p, params.q)
        lut_out[s] = (
            shortint.apply_lut(params, key, a.ct, lo_lut, sp, ntt_impl),
            shortint.apply_lut(params, key, a.ct, hi_lut, sp, ntt_impl))
    terms = []
    for j, s in enumerate(s_limbs):
        if s == 0:
            continue
        for i in range(L - j):
            if s == 1:
                terms.append((i + j, i, a.ct))
            else:
                lo, hi = lut_out[s]
                terms.append((i + j, i, lo))
                if i + j + 1 < L:
                    terms.append((i + j + 1, i, hi))
    if not terms:
        return trivial_encrypt(params, rp,
                               np.zeros(a.batch_shape, dtype=np.int64))
    return _carry_save_reduce(params, key, rp, terms, a.ct, ntt_impl)


def div_scalar(params: TfheParams, key: rgsw.BootstrapKey, a: RadixInt,
               scalar, ntt_impl=None) -> RadixInt:
    q, _ = divrem(params, key, a, _trivial_scalar(params, a, scalar),
                  ntt_impl)
    return q


def rem_scalar(params: TfheParams, key: rgsw.BootstrapKey, a: RadixInt,
               scalar, ntt_impl=None) -> RadixInt:
    _, r = divrem(params, key, a, _trivial_scalar(params, a, scalar),
                  ntt_impl)
    return r


def compare_scalar(params: TfheParams, key: rgsw.BootstrapKey, op: str,
                   a: RadixInt, scalar, ntt_impl=None) -> lwe.LweCiphertext:
    return compare(params, key, op, a, _trivial_scalar(params, a, scalar),
                   ntt_impl)


def bitwise_scalar(params: TfheParams, key: rgsw.BootstrapKey, op: str,
                   a: RadixInt, scalar, ntt_impl=None) -> RadixInt:
    return bitwise(params, key, op, a, _trivial_scalar(params, a, scalar),
                   ntt_impl)


def shift_left_enc(params: TfheParams, key: rgsw.BootstrapKey, x: RadixInt,
                   k: RadixInt, ntt_impl=None,
                   rotate: bool = False) -> RadixInt:
    """Shl/Rotl by an ENCRYPTED amount — barrel shifter (the reference's
    radix::Shl(a, bits) is a stub returning `a`, radix.cpp:434-450).

    Round i selects between the running value and its plaintext shift by
    2^i using bit i of k; every select is fully limb-batched.  Shift
    amounts >= total_bits zero the result (EVM semantics) via one final
    ge-compare select; rotations reduce 2^i mod total_bits so only
    rounds with a nonzero residue run (log2(nbits) rounds for
    power-of-two widths)."""
    nbits = x.rp.total_bits
    if k.max_limb >= k.rp.limb.msg_mod:
        k = propagate_carries(params, key, k, ntt_impl)
    out = x
    kbits = k.rp.total_bits if rotate else (nbits - 1).bit_length()
    for i in range(kbits):
        r = ((1 << i) % nbits) if rotate else (1 << i)
        if r == 0:
            continue
        bit = _extract_bit(params, key, k, i, ntt_impl)
        shifted = shift_left(params, key, out, r, ntt_impl, rotate=rotate)
        out = select(params, key, bit, shifted, out, ntt_impl)
    if not rotate:
        ge = compare_scalar(params, key, "ge", k, nbits, ntt_impl)
        zero = trivial_encrypt(params, x.rp,
                               np.zeros(x.batch_shape, dtype=np.int64))
        out = select(params, key, ge, zero, out, ntt_impl)
    return out


def shift_right_enc(params: TfheParams, key: rgsw.BootstrapKey, x: RadixInt,
                    k: RadixInt, ntt_impl=None,
                    rotate: bool = False) -> RadixInt:
    """Shr/Rotr by an encrypted amount (barrel; see shift_left_enc)."""
    nbits = x.rp.total_bits
    if k.max_limb >= k.rp.limb.msg_mod:
        k = propagate_carries(params, key, k, ntt_impl)
    out = x
    kbits = k.rp.total_bits if rotate else (nbits - 1).bit_length()
    for i in range(kbits):
        r = ((1 << i) % nbits) if rotate else (1 << i)
        if r == 0:
            continue
        bit = _extract_bit(params, key, k, i, ntt_impl)
        shifted = shift_right(params, key, out, r, ntt_impl, rotate=rotate)
        out = select(params, key, bit, shifted, out, ntt_impl)
    if not rotate:
        ge = compare_scalar(params, key, "ge", k, nbits, ntt_impl)
        zero = trivial_encrypt(params, x.rp,
                               np.zeros(x.batch_shape, dtype=np.int64))
        out = select(params, key, ge, zero, out, ntt_impl)
    return out


def encrypt_pk(params: TfheParams, rp: RadixParams, pk, ksk, values,
               rng: np.random.Generator) -> RadixInt:
    """Public-key radix encryption (fhevm.h EncryptPublic): every limb
    encrypts under the ring-dimension LWE public key, then switches to
    (n, q) with the bootstrap key's switching key."""
    vals = np.asarray(values)
    limbs = _limbs_of(vals, rp).reshape(vals.shape + (rp.num_limbs,))
    ct = lwe.encrypt_pk(params, pk, limbs, rng, p=rp.limb.p)
    ct = lwe.switch_ct_to_qn(params, ksk, ct)
    return RadixInt(ct=ct, rp=rp, max_limb=rp.limb.msg_mod - 1)


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
