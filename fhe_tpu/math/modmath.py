"""32-bit modular arithmetic primitives for TPU.

All FHE moduli in this framework are NTT-friendly primes q < 2^31, so every
ring element lives in uint32 arrays and all modular arithmetic decomposes into
16-bit limb products that the TPU VPU executes natively.  This mirrors the
rationale of the reference GPU backend (/root/reference/src/core/lib/math/hal/
mlx/barrett_metal.h:1-16 -- "constant-time Barrett without 128-bit ints,
32x32->64 via 16-bit halves"), re-derived for XLA/Pallas:

  * `mul32_parts`   -- exact 32x32 -> (hi, lo) uint32 product (4 VPU muls)
  * `mont_mul`      -- Montgomery REDC product, R = 2^32 (general a*b mod q)
  * `shoup_mul`     -- Shoup product against a precomputed constant (w, w')
  * `reduce_i32`    -- exact reduction of signed int32 MXU accumulators mod q
  * `divmod_u64_u32`-- exact 64-bit/32-bit divmod via f32 estimate + fixup
                       (used by LWE modulus switching, RoundqQ semantics of
                       reference src/binfhe/lib/lwe-pke.cpp:41)

Host-side constant helpers (`mont_r2`, `shoup_precompute`, ...) use plain
Python ints and are exact.

Everything device-side is uint32/int32/float32 only: no 64-bit types reach
XLA, so the same code compiles for TPU (which has no fast u64 multiply) and
for the CPU test mesh.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

U32 = jnp.uint32
I32 = jnp.int32
F32 = jnp.float32

_MASK16 = np.uint32(0xFFFF)


def u32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=U32)


# ---------------------------------------------------------------------------
# 32x32 -> 64 products from 16-bit halves
# ---------------------------------------------------------------------------

def mul32_parts(a, b):
    """Exact (hi, lo) uint32 words of the 64-bit product a*b.

    a, b: uint32 arrays (broadcastable). 4 multiplies + carry fixups.
    """
    a = a.astype(U32) if hasattr(a, "astype") else u32(a)
    b = b.astype(U32) if hasattr(b, "astype") else u32(b)
    a_lo = a & _MASK16
    a_hi = a >> 16
    b_lo = b & _MASK16
    b_hi = b >> 16
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    mid = lh + (ll >> 16)          # <= (2^16-1)^2 + (2^16-1) < 2^32, no wrap
    mid2 = mid + hl                # may wrap
    carry = (mid2 < hl).astype(U32)
    lo = (ll & _MASK16) | (mid2 << 16)
    hi = hh + (mid2 >> 16) + (carry << 16)
    return hi, lo


def mul32_hi(a, b):
    """High uint32 word of the 64-bit product a*b."""
    return mul32_parts(a, b)[0]


def mul32_lo(a, b):
    """Low uint32 word of a*b (plain wrapping multiply)."""
    return (u32(a) * u32(b)).astype(U32)


# ---------------------------------------------------------------------------
# Modular add/sub/neg (inputs in [0, q), q < 2^31)
# ---------------------------------------------------------------------------

def add_mod(a, b, q):
    t = u32(a) + u32(b)
    return jnp.where(t >= q, t - u32(q), t)


def sub_mod(a, b, q):
    a = u32(a)
    b = u32(b)
    return jnp.where(a >= b, a - b, a + (u32(q) - b))


def neg_mod(a, q):
    a = u32(a)
    return jnp.where(a == 0, a, u32(q) - a)


# ---------------------------------------------------------------------------
# Montgomery multiplication, R = 2^32
# ---------------------------------------------------------------------------

def mont_mul(a, b, q, qinv_neg):
    """(a * b * R^-1) mod q with R = 2^32.

    Requires odd q < 2^31, a, b in [0, q).  `qinv_neg` = -q^-1 mod 2^32 as a
    uint32 scalar (host precomputed, see `mont_constants`).

    If b is in Montgomery form (b = x*R mod q) the result is a*x mod q in
    plain form -- the framework keeps key material in Montgomery form and
    ciphertext data in plain form so pointwise EVALUATION products cost one
    REDC and no conversions.
    """
    hi, lo = mul32_parts(a, b)
    m = mul32_lo(lo, qinv_neg)
    mq_hi = mul32_hi(m, q)
    t = hi + mq_hi + (lo != 0).astype(U32)
    return jnp.where(t >= q, t - u32(q), t)


def mont_constants(q: int):
    """Host: (qinv_neg, r1, r2) = (-q^-1 mod 2^32, R mod q, R^2 mod q)."""
    q = int(q)
    assert q % 2 == 1 and 2 < q < 2**31
    qinv = pow(q, -1, 1 << 32)
    qinv_neg = ((1 << 32) - qinv) & 0xFFFFFFFF
    r1 = (1 << 32) % q
    r2 = pow(1 << 32, 2, q)
    return np.uint32(qinv_neg), np.uint32(r1), np.uint32(r2)


def to_mont(a, q, qinv_neg, r2):
    return mont_mul(a, u32(r2), q, qinv_neg)


def from_mont(a, q, qinv_neg):
    return mont_mul(a, u32(1), q, qinv_neg)


# ---------------------------------------------------------------------------
# Shoup multiplication by a precomputed constant
# ---------------------------------------------------------------------------

def shoup_precompute(w: int, q: int) -> int:
    """Host: w' = floor(w * 2^32 / q) for shoup_mul. Requires w < q < 2^31."""
    assert 0 <= w < q < 2**31
    return (w << 32) // q


def shoup_mul(a, w, w_shoup, q):
    """a * w mod q where (w, w') precomputed; a may be any uint32.

    Matches the precon/Shoup butterflies of the reference CPU NTT
    (src/core/include/math/hal/intnat/transformnat-impl.h:302-374).
    """
    qt = mul32_hi(a, u32(w_shoup))
    r = mul32_lo(a, w) - mul32_lo(qt, q)
    return jnp.where(r >= q, r - u32(q), r)


def shoup_mul_lazy(a, w, w_shoup, q):
    """Shoup product WITHOUT the final conditional subtract: returns a
    value in [0, 2q) congruent to a*w mod q.  Callers accumulate several
    lazy products with plain uint32 adds (exact as long as the running
    sum stays < 2^32) and defer the reduction to the consumer -- e.g.
    mont_mul tolerates any a with a*b < q*2^32 (REDC bound)."""
    qt = mul32_hi(a, u32(w_shoup))
    return mul32_lo(a, w) - mul32_lo(qt, q)


# ---------------------------------------------------------------------------
# Reduction of signed int32 accumulators (MXU matmul outputs) mod q
# ---------------------------------------------------------------------------

def reduce_i32(x, q):
    """Exact x mod q for int32 x with |x| < 2^30 and q < 2^31.

    Uses a float32 quotient estimate plus integer fixup; the estimate is
    within +-1 of the true rounded quotient so two correction rounds suffice.
    For q in [2^30, 2^31) the quotient k is in {-1, 0, 1} (|x| < 2^30 <= q),
    so k*q and the corrections stay exactly representable in int32; for
    q < 2^30 the usual |k| <= 2^30/q bound applies.  Returns uint32 in [0, q).
    """
    x = x.astype(I32)
    qf = jnp.asarray(1.0 / float(q), dtype=F32)
    k = jnp.round(x.astype(F32) * qf).astype(I32)
    r = x - k * jnp.asarray(q, dtype=I32)
    qi = jnp.asarray(q, dtype=I32)
    # k is within +-1 of round(x/q) (float32 error bound: |x| 2^-23/q +
    # reciprocal rounding << 1/2), so r in (-1.5q, 1.5q): ONE correction
    # each direction suffices
    r = jnp.where(r < 0, r + qi, r)
    r = jnp.where(r >= qi, r - qi, r)
    return r.astype(U32)


def reduce_i32_arr(x, q_i32, qinv_f32):
    """reduce_i32 with per-element (broadcastable) moduli.

    x int32 with |x| < 2^30; q_i32 int32 moduli < 2^31 (broadcast shape);
    qinv_f32 = 1/q as float32 (same shape).  Exact under the same
    quotient-estimate argument as reduce_i32.  Returns uint32 in [0, q).
    """
    x = x.astype(I32)
    k = jnp.round(x.astype(F32) * qinv_f32).astype(I32)
    r = x - k * q_i32
    # same +-1 quotient-estimate bound as reduce_i32
    r = jnp.where(r < 0, r + q_i32, r)
    r = jnp.where(r >= q_i32, r - q_i32, r)
    return r.astype(U32)


def fraction_round_v(y: jnp.ndarray, mods: tuple,
                     centered: bool = False) -> jnp.ndarray:
    """v = floor(sum_i y[..., i, :] / q_i) (centered=False, lifting the
    unsigned representative in [0, Q)) or round(...) (centered=True,
    lifting the centered representative in [-Q/2, Q/2)).

    y: uint32 [..., L, N] with y_i < q_i.  Implements the HPS floating-point
    correction integer-only: each 1/q_i is the 62-bit reciprocal
    mu_i = floor(2^62 / q_i), products are accumulated in a 96-bit
    (3 x uint32) accumulator, and v = floor((acc + 2^61) / 2^62).
    Truncation error < L * 2^-31 relative, so rounding is exact unless the
    true fractional sum is within L*2^-27 of 1/2 (negligible)."""
    L = y.shape[-2]
    mus = [(1 << 62) // q for q in mods]           # up to ~2^42 for small q
    w0 = jnp.zeros(y.shape[:-2] + y.shape[-1:], dtype=U32)
    w1 = jnp.zeros_like(w0)
    w2 = jnp.zeros_like(w0)

    def acc(w0, w1, w2, add0, add1):
        """(w2:w1:w0) += (add1:add0), all uint32 words."""
        nw0 = w0 + add0
        c0 = (nw0 < add0).astype(U32)
        t = w1 + add1
        ca = (t < add1).astype(U32)
        nw1 = t + c0
        cb = (nw1 < c0).astype(U32)
        return nw0, nw1, w2 + ca + cb

    for i in range(L):
        mu = mus[i]
        mu_lo, mu_hi = mu & 0xFFFFFFFF, mu >> 32
        yi = y[..., i, :]
        h1, l1 = mul32_parts(yi, u32(mu_lo))
        w0, w1, w2 = acc(w0, w1, w2, l1, h1)
        if mu_hi:
            h2, l2 = mul32_parts(yi, u32(mu_hi))   # contributes at +32 bits
            w0, w1, w2 = acc(w0, w1, w2, jnp.zeros_like(w0), l2)
            w2 = w2 + h2
    if centered:
        # add 2^61 for round-half-up: touches w1 bit 29
        r = u32(1 << 29)
        nw1 = w1 + r
        w2 = w2 + (nw1 < r).astype(U32)
        w1 = nw1
    # v = floor(total / 2^62) = (w2 << 2) | (w1 >> 30)
    return (w2 << 2) | (w1 >> 30)


def sum_mod(x, axis: int, q: int):
    """Sum of uint32 values in [0, q) along `axis`, mod q, without overflow.

    If q is a power of two, uint32 wrap-around is exact mod q.  Otherwise the
    reduction is chunked so partial sums stay below 2^32, with a Barrett
    reduction between chunks.
    """
    x = u32(x)
    axis = axis % x.ndim
    n = x.shape[axis]
    if q & (q - 1) == 0:
        return jnp.sum(x, axis=axis, dtype=U32) & u32(q - 1)
    mu = np.uint32((1 << 32) // q)
    chunk = max(1, (1 << 32) // q - 1)  # how many [0,q) values sum safely
    while n > 1:
        c = min(chunk, n)
        groups = -(-n // c)
        pad = groups * c - n
        if pad:
            pads = [(0, 0)] * x.ndim
            pads[axis] = (0, pad)
            x = jnp.pad(x, pads)
        shp = list(x.shape)
        shp[axis:axis + 1] = [groups, c]
        x = jnp.sum(x.reshape(shp), axis=axis + 1, dtype=U32)
        x = barrett_reduce_u32(x, q, mu)
        n = groups
    return jnp.squeeze(x, axis=axis)


def barrett_reduce_u32(x, q, mu):
    """x mod q for arbitrary uint32 x; mu = floor(2^32 / q) precomputed."""
    k = mul32_hi(u32(x), u32(mu))
    r = u32(x) - mul32_lo(k, q)
    r = jnp.where(r >= q, r - u32(q), r)
    r = jnp.where(r >= q, r - u32(q), r)
    return r


# ---------------------------------------------------------------------------
# 64-bit by 32-bit exact divmod (for RoundqQ modulus switching)
# ---------------------------------------------------------------------------

def _sub64(a_hi, a_lo, b_hi, b_lo):
    lo = a_lo - b_lo
    borrow = (a_lo < b_lo).astype(U32)
    hi = a_hi - b_hi - borrow
    return hi, lo


def _add64(a_hi, a_lo, b_hi, b_lo):
    lo = a_lo + b_lo
    carry = (lo < b_lo).astype(U32)
    hi = a_hi + b_hi + carry
    return hi, lo


def _lt64(a_hi, a_lo, b_hi, b_lo):
    return (a_hi < b_hi) | ((a_hi == b_hi) & (a_lo < b_lo))


def divmod_u64_u32(hi, lo, d: int):
    """Exact (quotient, remainder) of (hi*2^32 + lo) / d for uint32 words.

    d is a static Python int, 0 < d < 2^32; the quotient must fit in uint32
    AND be < 2^25 (the float32 estimate error is dividend * 2^-24 / d, so a
    quotient bound of 2^25 keeps the fixup within the 3 correction rounds).
    All modulus-switching uses satisfy this: quotient <= q <= 2^25.
    """
    hi = u32(hi)
    lo = u32(lo)
    xf = hi.astype(F32) * jnp.asarray(4294967296.0, F32) + lo.astype(F32)
    k = (xf * jnp.asarray(1.0 / float(d), F32))
    # float -> uint32 conversion clamps; keep it in range first
    k = jnp.clip(k, 0.0, 4294967040.0).astype(U32)
    kd_hi, kd_lo = mul32_parts(k, u32(int(d)))
    r_hi, r_lo = _sub64(hi, lo, kd_hi, kd_lo)
    d_u = u32(int(d))
    zero = jnp.zeros_like(hi)
    # correction: while r < 0 (wrapped): k -= 1, r += d; while r >= d: k += 1, r -= d
    for _ in range(3):
        neg = r_hi >> 31  # top bit set => negative in two's complement 64-bit
        k = jnp.where(neg == 1, k - 1, k)
        r_hi, r_lo = jnp.where(neg == 1, jnp.stack(_add64(r_hi, r_lo, zero, d_u)), jnp.stack((r_hi, r_lo)))
    for _ in range(3):
        ge = ~_lt64(r_hi, r_lo, zero, d_u)
        k = jnp.where(ge, k + 1, k)
        r_hi, r_lo = jnp.where(ge, jnp.stack(_sub64(r_hi, r_lo, zero, d_u)), jnp.stack((r_hi, r_lo)))
    return k, r_lo


def round_scale_mod(v, num: int, den: int, out_mod: int):
    """floor(0.5 + v * num / den) mod out_mod, exactly.

    This is RoundqQ of the reference (src/binfhe/lib/lwe-pke.cpp:41-46):
    v in [0, den), num < 2^31, den < 2^31.
    """
    hi, lo = mul32_parts(u32(v), u32(int(num)))
    # floor(0.5 + x/den) == floor((2x + den) / (2 den)) exactly, including
    # odd den where den/2 is not integral.
    two_hi = (hi << 1) | (lo >> 31)
    two_lo = lo << 1
    den_u = u32(int(den))
    t_hi, t_lo = _add64(two_hi, two_lo, jnp.zeros_like(hi), den_u)
    k, _ = divmod_u64_u32(t_hi, t_lo, 2 * int(den))
    m = u32(int(out_mod))
    # k <= num (since v < den), out_mod >= num in all uses, but reduce anyway
    return jnp.where(k >= m, k - m, k)


# ---------------------------------------------------------------------------
# 64-bit arithmetic on (hi, lo) uint32 word pairs -- TPU has no native u64.
# Used by the 2-limb RNS TFHE accumulator's digit decomposition
# (tfhe/rgsw_rns.py) to reconstruct |v| < 2^63 coefficient values.
# ---------------------------------------------------------------------------

def u64_add(h1, l1, h2, l2):
    lo = u32(l1) + u32(l2)
    carry = (lo < u32(l1)).astype(U32)
    return u32(h1) + u32(h2) + carry, lo


def u64_add_const(h, l, c: int):
    return u64_add(h, l, u32((c >> 32) & 0xFFFFFFFF), u32(c & 0xFFFFFFFF))


def u64_sub(h1, l1, h2, l2):
    lo = u32(l1) - u32(l2)
    borrow = (u32(l1) < u32(l2)).astype(U32)
    return u32(h1) - u32(h2) - borrow, lo


def u64_geq(h1, l1, h2, l2):
    """1 where (h1,l1) >= (h2,l2)."""
    return jnp.where(u32(h1) != u32(h2), u32(h1) > u32(h2),
                     u32(l1) >= u32(l2))


def u64_shr(h, l, s: int):
    """Logical right shift by 0 <= s < 64; returns the LOW word of the
    result (sufficient when the caller masks to < 32 bits)."""
    if s == 0:
        return u32(l)
    if s < 32:
        return (u32(l) >> s) | (u32(h) << (32 - s))
    return u32(h) >> (s - 32)
