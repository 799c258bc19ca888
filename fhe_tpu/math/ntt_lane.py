"""Lane-factored negacyclic NTT: N = n1 x 128 with the 128-point DFT as
one int8 MXU matmul over the LANE axis and the n1-point DFT as butterfly
stages over the SUBLANE axis.

This is the TPU-shaped four-step decomposition (reference algorithm:
/root/reference/src/core/include/math/hal/mlx/ntt_fourstep.h:1-14) with
the factors chosen for the 8x128 vector registers: the O(N^2) dense MXU
path (math/ntt.py forward_mxu) costs N/128 = 8x more MXU MACs at N=1024,
and the generic four-step split (32x32) wastes 3/4 of every lane vector.
All twist/untwist/1/N factors fold into the constant tables, and the
layout is chosen so NO transpose or permutation is ever needed:

  EVALUATION (natural): position [k1, k2] = X[128*k1 + k2]
  COEFFICIENT (interleaved): position [i1, i2] = x[i1 + n1*i2]

forward  (coeff-interleaved -> eval-natural):
  lane matmul over i2 (twist psi^{n1*i2} folded into W128f rows)
  -> pointwise twiddle psi^{i1} * omega^{i1*k2}
  -> sublane DFT-n1 (omega^{128})^{i1*k1}
inverse  (eval-natural -> coeff-interleaved):
  sublane DFT-n1 (omega^{-128})^{i1*k1}
  -> pointwise twiddle psi^{-i1} * omega^{-i1*k2}
  -> lane matmul over k2 (psi^{-n1*i2}/N folded into W128i columns)

Both directions are bit-exact vs ntt.forward_butterfly/inverse_butterfly
(tested), so the blind-rotate megakernel consumes/produces standard
natural-order EVALUATION data with no BSK or monomial-table relabeling;
only the COEFFICIENT-domain digit decomposition sees the interleaved
order, and it is pointwise.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import ntt as nttmod
from .modmath import (U32, u32, add_mod, sub_mod, shoup_mul, reduce_i32,
                      shoup_precompute)

LANES = 128


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LanePlan:
    """Tables for the (N, q) lane-factored NTT.  n1 = N // 128."""
    N: int = dataclasses.field(metadata=dict(static=True))
    q: int = dataclasses.field(metadata=dict(static=True))
    n1: int = dataclasses.field(metadata=dict(static=True))
    d: int = dataclasses.field(metadata=dict(static=True))      # digit planes
    # int8 digit-plane lane-DFT matrices
    W128f_s2: jax.Array   # [2*128, d*128]  forward, signed base-128 input
    W128f: jax.Array      # [d*128, d*128]  forward, full uint32 input
    W128i: jax.Array      # [d*128, d*128]  inverse (untwist + 1/N folded)
    # pointwise twiddles [n1, 128] (+ shoup duals)
    tw_f: jax.Array
    tw_f_s: jax.Array
    tw_i: jax.Array
    tw_i_s: jax.Array
    # sublane DFT stage twiddles: [log2(n1), n1, 128] lane-broadcast
    # (+ duals), CT order with bit-reversed input rows
    st_f: jax.Array
    st_f_s: jax.Array
    st_i: jax.Array
    st_i_s: jax.Array
    # roll-based DIF (natural->BR) / DIT (BR->natural) stage twiddles for
    # the megakernel: same [logn1, n1, 128] lane-broadcast layout
    st2_f: jax.Array
    st2_f_s: jax.Array
    st2_i: jax.Array
    st2_i_s: jax.Array
    # recombination constants, lane-broadcast: row 0 = 2^14 mod q,
    # row 1 = its shoup dual
    comb14: jax.Array     # [2, 128]
    # generic per-plane recombination: 2^(7v) mod q + shoup duals,
    # lane-broadcast (used when d not in (3, 4), e.g. 31-bit PKE primes)
    comb7: jax.Array      # [d, 128]
    comb7_s: jax.Array    # [d, 128]
    # twiddle-fused recombination (megakernel forward path): the plane
    # weight 2^14 folded into the pointwise twiddle, tw14 = tw_f * 2^14
    # mod q (+ shoup dual) -- lets _recombine_tw emit tw-multiplied
    # values with no separate twiddle pass
    tw_f14: jax.Array     # [n1, 128]
    tw_f14_s: jax.Array


@functools.lru_cache(maxsize=None)
def make_lane_plan(N: int, q: int) -> LanePlan:
    with jax.ensure_compile_time_eval():
        return _make_lane_plan(N, q)


def _pow_table(base: int, length: int, q: int) -> np.ndarray:
    out = np.zeros(length, dtype=np.uint64)
    acc = 1
    for i in range(length):
        out[i] = acc
        acc = acc * base % q
    return out


def _make_lane_plan(N: int, q: int) -> LanePlan:
    assert N % LANES == 0 and (N // LANES) & (N // LANES - 1) == 0
    n1 = N // LANES
    plan = nttmod.make_plan(N, q)
    psi = plan.psi
    om = pow(psi, 2, q)                      # N-th root
    om8 = pow(om, n1, q)                     # 128-point root (order 128)
    om128 = pow(om, LANES, q)                # n1-point root (order n1)
    d = plan.d_full
    i2 = np.arange(LANES)
    k2 = np.arange(LANES)
    i1 = np.arange(n1)

    # forward lane matrix: W[i2, k2] = psi^(n1 i2) * om8^(i2 k2)
    Wf = (_pow_table(psi, 2 * N, q)[(n1 * i2) % (2 * N)][:, None] *
          _pow_table(om8, LANES, q)[np.outer(i2, k2) % LANES]) % q
    # inverse lane matrix: W[k2, i2] = om8^(-k2 i2) * psi^(-n1 i2) / N
    om8_inv = pow(om8, -1, q)
    psi_inv = pow(psi, -1, q)
    ninv = pow(N, -1, q)
    Wi = (_pow_table(om8_inv, LANES, q)[np.outer(k2, i2) % LANES] *
          ((_pow_table(psi_inv, 2 * N, q)[(n1 * i2) % (2 * N)] * ninv) % q
           )[None, :]) % q

    dig = lambda M, din, w: jnp.asarray(
        nttmod._build_digit_matrix(M, q, din, d, w))
    W128f_s2 = dig(Wf, 2, [1, 128])
    W128f = dig(Wf, d, [1 << (7 * u) for u in range(d)])
    W128i = dig(Wi, d, [1 << (7 * u) for u in range(d)])

    # pointwise twiddles: fwd tw[i1, k2] = psi^{i1} om^{i1 k2};
    # inv tw[i1, k2] = psi^{-i1} om^{-i1 k2}
    om_pows = _pow_table(om, N, q)
    psi_pows = _pow_table(psi, 2 * N, q)
    tw_f = (psi_pows[i1 % (2 * N)][:, None] *
            om_pows[np.outer(i1, k2) % N]) % q
    om_inv = pow(om, -1, q)
    omi_pows = _pow_table(om_inv, N, q)
    psii_pows = _pow_table(psi_inv, 2 * N, q)
    tw_i = (psii_pows[i1 % (2 * N)][:, None] *
            omi_pows[np.outer(i1, k2) % N]) % q

    shoup_arr = lambda a: ((a.astype(object) << 32) // q).astype(
        np.uint64).astype(np.uint32)

    # sublane DFT stages (cyclic, length n1, root om128).
    # Forward: CT stages on bit-reversed input rows; twiddle of stage s at
    # output row group: standard iterative radix-2 with tables per stage.
    logn1 = n1.bit_length() - 1
    omp = _pow_table(om128, n1, q)
    ompi = _pow_table(pow(om128, -1, q), n1, q)
    st_f = np.zeros((logn1, n1, 1), dtype=np.uint32)
    st_i = np.zeros((logn1, n1, 1), dtype=np.uint32)
    for s in range(logn1):
        m = 1 << (s + 1)
        for j in range(n1):
            t = j % m
            # butterfly twiddle exponent for position j at stage s:
            # w^( (t mod m/2) * n1/m )
            st_f[s, j, 0] = omp[((t % (m // 2)) * (n1 // m)) % n1]
            st_i[s, j, 0] = ompi[((t % (m // 2)) * (n1 // m)) % n1]
    # roll-based stage tables.  DIF forward, stage s (block m = n1 >> s,
    # half h = m/2): hi rows p compute (x[p-h] - x[p]) * (w^{2^s})^{p mod h};
    # DIT inverse, stage s (m = 2^{s+1}, h = 2^s): twiddle
    # (w^{-1})^{((p mod m) mod h) * (n1/m)} multiplies the partner (lo rows)
    # or self (hi rows).
    st2_f = np.zeros((logn1, n1, 1), dtype=np.uint32)
    st2_i = np.zeros((logn1, n1, 1), dtype=np.uint32)
    for s in range(logn1):
        m_f = n1 >> s
        h_f = m_f >> 1
        m_i = 1 << (s + 1)
        h_i = m_i >> 1
        for p in range(n1):
            st2_f[s, p, 0] = omp[(((p % m_f) % h_f) << s) % n1]
            st2_i[s, p, 0] = ompi[(((p % m_i) % h_i) * (n1 // m_i)) % n1]

    bcast = lambda a: np.broadcast_to(a, a.shape[:-1] + (LANES,)).copy()
    st_f, st_i = bcast(st_f), bcast(st_i)
    st2_f, st2_i = bcast(st2_f), bcast(st2_i)
    comb14 = bcast(np.array(
        [[(1 << 14) % q], [shoup_precompute((1 << 14) % q, q)]],
        dtype=np.uint32))
    comb7 = bcast(np.array([[(1 << (7 * v)) % q] for v in range(d)],
                           dtype=np.uint32))
    comb7_s = bcast(np.array(
        [[shoup_precompute((1 << (7 * v)) % q, q)] for v in range(d)],
        dtype=np.uint32))

    tw_f14 = (tw_f * ((1 << 14) % q)) % q
    return LanePlan(
        N=N, q=q, n1=n1, d=d,
        W128f_s2=W128f_s2, W128f=W128f, W128i=W128i,
        tw_f14=jnp.asarray(tw_f14.astype(np.uint32)),
        tw_f14_s=jnp.asarray(shoup_arr(tw_f14)),
        tw_f=jnp.asarray(tw_f.astype(np.uint32)),
        tw_f_s=jnp.asarray(shoup_arr(tw_f)),
        tw_i=jnp.asarray(tw_i.astype(np.uint32)),
        tw_i_s=jnp.asarray(shoup_arr(tw_i)),
        st_f=jnp.asarray(st_f), st_f_s=jnp.asarray(shoup_arr(st_f)),
        st_i=jnp.asarray(st_i), st_i_s=jnp.asarray(shoup_arr(st_i)),
        st2_f=jnp.asarray(st2_f), st2_f_s=jnp.asarray(shoup_arr(st2_f)),
        st2_i=jnp.asarray(st2_i), st2_i_s=jnp.asarray(shoup_arr(st2_i)),
        comb14=jnp.asarray(comb14),
        comb7=jnp.asarray(comb7), comb7_s=jnp.asarray(comb7_s),
    )


# ---------------------------------------------------------------------------
# shared compute blocks (used by both the XLA reference and the Pallas
# megakernel -- identical arithmetic, hence bit-identical results)
# ---------------------------------------------------------------------------

def _sublane_dft(lp: LanePlan, x: jax.Array, inverse: bool) -> jax.Array:
    """Cyclic DFT of length n1 over axis -2 of [..., n1, 128] mod q.
    Natural order in and out (input rows pre-permuted to bit-reversed)."""
    q = lp.q
    n1 = lp.n1
    logn1 = n1.bit_length() - 1
    br = nttmod.bit_reverse_perm(n1)
    # static row permutation via concat of slices (pallas-safe)
    x = jnp.concatenate([x[..., int(j):int(j) + 1, :] for j in br], axis=-2)
    st = lp.st_i if inverse else lp.st_f
    sts = lp.st_i_s if inverse else lp.st_f_s
    for s in range(logn1):
        m = 1 << (s + 1)
        h = m >> 1
        xg = x.reshape(*x.shape[:-2], n1 // m, m, LANES)
        u = xg[..., :h, :]
        v = shoup_mul(xg[..., h:, :],
                      st[s].reshape(n1 // m, m, LANES)[..., :h, :],
                      sts[s].reshape(n1 // m, m, LANES)[..., :h, :], q)
        x = jnp.concatenate([add_mod(u, v, q), sub_mod(u, v, q)],
                            axis=-2).reshape(*x.shape[:-2], n1, LANES)
    return x


def _recombine(lp: LanePlan, o: jax.Array) -> jax.Array:
    """[..., d*128] int32 matmul output (lane-concatenated planes) ->
    [..., 128] uint32 mod q (pairs-of-planes: one reduce_i32 per two
    planes -- sums stay under the 2^30 reduce_i32 bound)."""
    q = lp.q
    L = LANES
    p = lambda v: o[..., v * L:(v + 1) * L]
    if lp.d == 4:
        s01 = p(0) + (p(1) << 7)
        s23 = p(2) + (p(3) << 7)
        r = reduce_i32(s01, q)
        r2 = shoup_mul(reduce_i32(s23, q), lp.comb14[0:1], lp.comb14[1:2], q)
        return add_mod(r, r2, q)
    if lp.d == 3:
        s01 = p(0) + (p(1) << 7)
        r = reduce_i32(s01, q)
        r2 = shoup_mul(reduce_i32(p(2), q), lp.comb14[0:1],
                       lp.comb14[1:2], q)
        return add_mod(r, r2, q)
    # generic path (d = 5 for 31-bit PKE primes): per-plane reduction
    # (matmul accumulators are bounded by d*128*127^2 < 2^30 regardless
    # of N, so reduce_i32 stays exact) + shoup combine by 2^(7v)
    r = reduce_i32(p(0), q)
    for v in range(1, lp.d):
        term = shoup_mul(reduce_i32(p(v), q),
                         lp.comb7[v:v + 1], lp.comb7_s[v:v + 1], q)
        r = add_mod(r, term, q)
    return r


def _lane_matmul(planes: jax.Array, W: jax.Array) -> jax.Array:
    """[..., din*128] int8 lane-concat planes x [din*128, d*128] ->
    [..., d*128] int32.  Plane u occupies lanes [u*128, (u+1)*128) --
    matching _build_digit_matrix's block-row layout -- so no sublane->lane
    relayout is needed on either side."""
    k = planes.shape[-1]
    lead = planes.shape[:-1]
    flat = planes.reshape(-1, k)
    o = jax.lax.dot_general(flat, W, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return o.reshape(*lead, W.shape[1])


def _decompose_u32(x: jax.Array, d: int) -> jax.Array:
    """[..., 128] uint32 -> [..., d*128] int8 7-bit planes (lane-concat)."""
    return jnp.concatenate(
        [((x >> (7 * u)) & u32(127)).astype(jnp.int8) for u in range(d)],
        axis=-1)


def forward_lane_digits(lp: LanePlan, lo: jax.Array, hi: jax.Array
                        ) -> jax.Array:
    """Forward NTT of small signed values v = lo + 128*hi (balanced
    base-128 planes), COEFF-interleaved [..., n1, 128] -> EVAL-natural.
    lo/hi int8 [..., n1, 128]."""
    planes = jnp.concatenate([lo, hi], axis=-1)      # [..., n1, 2*128]
    o = _lane_matmul(planes, lp.W128f_s2)            # [..., n1, d*128]
    y = _recombine(lp, o)                            # [..., n1, 128]
    y = shoup_mul(y, lp.tw_f, lp.tw_f_s, lp.q)
    return _sublane_dft(lp, y, inverse=False)


def forward_lane(lp: LanePlan, x: jax.Array) -> jax.Array:
    """Forward NTT of full-range uint32, COEFF-interleaved -> EVAL-natural.
    x: [..., n1, 128] uint32 in [0, q)."""
    planes = _decompose_u32(x, lp.d)
    o = _lane_matmul(planes, lp.W128f)
    y = _recombine(lp, o)
    y = shoup_mul(y, lp.tw_f, lp.tw_f_s, lp.q)
    return _sublane_dft(lp, y, inverse=False)


def inverse_lane(lp: LanePlan, x: jax.Array) -> jax.Array:
    """Inverse NTT, EVAL-natural [..., n1, 128] -> COEFF-interleaved."""
    u = _sublane_dft(lp, x, inverse=True)
    v = shoup_mul(u, lp.tw_i, lp.tw_i_s, lp.q)
    planes = _decompose_u32(v, lp.d)
    o = _lane_matmul(planes, lp.W128i)
    return _recombine(lp, o)


# ---------------------------------------------------------------------------
# roll-based sublane DFT (megakernel variant): DIF forward emits the
# sublane axis in bit-reversed order and DIT inverse consumes it, so the
# EVAL-side storage order is "sublane-BR" and NO permutation ever runs
# inside the kernel (BSK/monomial tables are BR-permuted once at load).
# `roll(x, shift)` must rotate axis -2; the kernel passes a pltpu.roll
# wrapper, tests pass jnp.roll.
# ---------------------------------------------------------------------------

def sublane_dif(lp: LanePlan, x: jax.Array, roll) -> jax.Array:
    """Forward cyclic DFT-n1 over axis -2: natural in, BIT-REVERSED out."""
    q = lp.q
    n1 = lp.n1
    logn1 = n1.bit_length() - 1
    pos = None
    for s in range(logn1):
        m = n1 >> s
        h = m >> 1
        if pos is None:
            pos = jax.lax.broadcasted_iota(jnp.uint32, x.shape, x.ndim - 2)
        lo = ((pos // u32(h)) & u32(1)) == 0
        partner = jnp.where(lo, roll(x, -h), roll(x, h))
        x = jnp.where(lo, add_mod(x, partner, q),
                      shoup_mul(sub_mod(partner, x, q),
                                lp.st2_f[s], lp.st2_f_s[s], q))
    return x


def sublane_dit(lp: LanePlan, x: jax.Array, roll) -> jax.Array:
    """Inverse-root cyclic DFT-n1 over axis -2: BIT-REVERSED in, natural
    out (no 1/n1 -- folded into W128i)."""
    q = lp.q
    n1 = lp.n1
    logn1 = n1.bit_length() - 1
    pos = jax.lax.broadcasted_iota(jnp.uint32, x.shape, x.ndim - 2)
    for s in range(logn1):
        h = 1 << s
        lo = ((pos // u32(h)) & u32(1)) == 0
        partner = jnp.where(lo, roll(x, -h), roll(x, h))
        tv = shoup_mul(jnp.where(lo, partner, x),
                       lp.st2_i[s], lp.st2_i_s[s], q)
        x = jnp.where(lo, add_mod(x, tv, q), sub_mod(partner, tv, q))
    return x


def _jnp_roll2(x, shift):
    return jnp.roll(x, shift, axis=-2)


def forward_lane_digits_br(lp: LanePlan, lo: jax.Array, hi: jax.Array,
                           roll=_jnp_roll2) -> jax.Array:
    """forward_lane_digits with sublane-BR EVAL output (kernel order)."""
    planes = jnp.concatenate([lo, hi], axis=-1)
    o = _lane_matmul(planes, lp.W128f_s2)
    y = _recombine(lp, o)
    y = shoup_mul(y, lp.tw_f, lp.tw_f_s, lp.q)
    return sublane_dif(lp, y, roll)


def inverse_lane_br(lp: LanePlan, x: jax.Array,
                    roll=_jnp_roll2) -> jax.Array:
    """inverse_lane consuming sublane-BR EVAL input (kernel order)."""
    u = sublane_dit(lp, x, roll)
    v = shoup_mul(u, lp.tw_i, lp.tw_i_s, lp.q)
    planes = _decompose_u32(v, lp.d)
    o = _lane_matmul(planes, lp.W128i)
    return _recombine(lp, o)


# ---------------------------------------------------------------------------
# lazy-reduction kernel variants: values ride in [0, 2q) between stages
# (Harvey-style), with exact reductions only where a consumer needs
# canonical data.  Congruences are identical to the exact paths, so any
# pipeline that canonicalizes its final output stays bit-identical.
# ---------------------------------------------------------------------------

def _sub2q(a, b, q2):
    """a - b in the [0, 2q) domain: both < 2q -> (a - b + 2q) in (0, 4q),
    fine as a Shoup multiplicand (any uint32)."""
    return a + (q2 - b)


def _red2q(t, q2):
    """One conditional subtract: t < 4q -> [0, 2q)."""
    return jnp.where(t >= q2, t - q2, t)


def sublane_dif_lazy(lp: LanePlan, x: jax.Array, roll) -> jax.Array:
    """sublane_dif with 2q-domain butterflies: input < 2q, output < 2q.
    Saves the sub_mod select and the Shoup final correction per stage."""
    q = lp.q
    q2 = u32(np.uint32(2 * q))
    n1 = lp.n1
    logn1 = n1.bit_length() - 1
    pos = None
    for s in range(logn1):
        m = n1 >> s
        h = m >> 1
        if pos is None:
            pos = jax.lax.broadcasted_iota(jnp.uint32, x.shape, x.ndim - 2)
        lo = ((pos // u32(h)) & u32(1)) == 0
        partner = jnp.where(lo, roll(x, -h), roll(x, h))
        from .modmath import shoup_mul_lazy
        x = jnp.where(lo, _red2q(x + partner, q2),
                      shoup_mul_lazy(_sub2q(partner, x, q2),
                                     lp.st2_f[s], lp.st2_f_s[s], q))
    return x


def sublane_dit_lazy(lp: LanePlan, x: jax.Array, roll) -> jax.Array:
    """sublane_dit with 2q-domain butterflies: input < 2q, output < 2q."""
    from .modmath import shoup_mul_lazy
    q = lp.q
    q2 = u32(np.uint32(2 * q))
    n1 = lp.n1
    logn1 = n1.bit_length() - 1
    pos = jax.lax.broadcasted_iota(jnp.uint32, x.shape, x.ndim - 2)
    for s in range(logn1):
        h = 1 << s
        lo = ((pos // u32(h)) & u32(1)) == 0
        partner = jnp.where(lo, roll(x, -h), roll(x, h))
        tv = shoup_mul_lazy(jnp.where(lo, partner, x),
                            lp.st2_i[s], lp.st2_i_s[s], q)
        x = jnp.where(lo, _red2q(x + tv, q2),
                      _red2q(_sub2q(partner, tv, q2), q2))
    return x


def _recombine_tw_lazy(lp: LanePlan, o: jax.Array) -> jax.Array:
    """_recombine with the forward twiddle FUSED into the plane weights
    (tw for planes 0-1, tw*2^14 for planes 2-3): emits tw-multiplied
    values in [0, 2q) with two lazy Shoup products and one 2q-reduction
    -- replaces recombine + separate twiddle pass.  d in {3, 4} only."""
    from .modmath import shoup_mul_lazy, reduce_i32
    q = lp.q
    q2 = u32(np.uint32(2 * q))
    L = LANES
    p = lambda v: o[..., v * L:(v + 1) * L]
    if lp.d == 4:
        r01 = reduce_i32(p(0) + (p(1) << 7), q)
        r23 = reduce_i32(p(2) + (p(3) << 7), q)
    elif lp.d == 3:
        r01 = reduce_i32(p(0) + (p(1) << 7), q)
        r23 = reduce_i32(p(2), q)
    else:
        raise ValueError("fused recombine supports d in (3, 4)")
    t = (shoup_mul_lazy(r01, lp.tw_f, lp.tw_f_s, q)
         + shoup_mul_lazy(r23, lp.tw_f14, lp.tw_f14_s, q))
    return _red2q(t, q2)


def forward_lane_digits_br_lazy(lp: LanePlan, lo: jax.Array, hi: jax.Array,
                                roll=_jnp_roll2) -> jax.Array:
    """forward_lane_digits_br emitting values in [0, 2q) (kernel path:
    the consumer is a Shoup/REDC multiply that accepts any uint32)."""
    planes = jnp.concatenate([lo, hi], axis=-1)
    o = _lane_matmul(planes, lp.W128f_s2)
    y = _recombine_tw_lazy(lp, o)
    return sublane_dif_lazy(lp, y, roll)


def inverse_lane_br_lazy_in(lp: LanePlan, x: jax.Array,
                            roll=_jnp_roll2) -> jax.Array:
    """inverse_lane_br accepting input in [0, 2q) (lazy accumulator);
    output is CANONICAL coefficients (the gadget decompose needs exact
    values)."""
    u = sublane_dit_lazy(lp, x, roll)
    v = shoup_mul(u, lp.tw_i, lp.tw_i_s, lp.q)
    planes = _decompose_u32(v, lp.d)
    o = _lane_matmul(planes, lp.W128i)
    return _recombine(lp, o)


def br_perm(n1: int) -> np.ndarray:
    return nttmod.bit_reverse_perm(n1)


# ---------------------------------------------------------------------------
# layout converters (host/XLA side; the kernel never permutes)
# ---------------------------------------------------------------------------

def coeff_to_interleaved(x: jax.Array, n1: int) -> jax.Array:
    """[..., N] natural coefficients -> [..., n1, 128] with
    [i1, i2] = x[i1 + n1*i2]."""
    return x.reshape(*x.shape[:-1], LANES, n1).swapaxes(-1, -2)


def interleaved_to_coeff(x: jax.Array) -> jax.Array:
    return x.swapaxes(-1, -2).reshape(*x.shape[:-2], -1)


def eval_to_blocked(x: jax.Array, n1: int) -> jax.Array:
    """[..., N] natural evaluation -> [..., n1, 128] (plain reshape)."""
    return x.reshape(*x.shape[:-1], n1, LANES)


def blocked_to_eval(x: jax.Array) -> jax.Array:
    return x.reshape(*x.shape[:-2], -1)


# ---------------------------------------------------------------------------
# stacked-limb RNS variant: ONE lane-factored NTT over [..., L, N] with a
# different modulus per limb row.  This is the PKE hot path: the RNS
# tower NTT (reference: per-tower ForwardTransformToBitReverseInPlace
# loops over DCRTPoly m_vectors, dcrtpoly-impl.h) becomes one batched
# int8 MXU matmul over the lane axis + log2(n1) sublane butterfly stages,
# replacing 2*log2(N) all-VPU butterfly stages per limb.
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StackPlan:
    """Lane-factored NTT tables for a STACK of moduli (one per limb).

    All limbs share d = max digit planes; smaller-modulus limbs simply
    have zero top input planes (exactness is unaffected -- the digit
    matrices already reduce every entry mod their own q)."""
    N: int = dataclasses.field(metadata=dict(static=True))
    moduli: tuple = dataclasses.field(metadata=dict(static=True))
    n1: int = dataclasses.field(metadata=dict(static=True))
    d: int = dataclasses.field(metadata=dict(static=True))
    W128f: jax.Array      # [L, d*128, d*128] int8
    W128i: jax.Array      # [L, d*128, d*128] int8
    tw_f: jax.Array       # [L, n1, 128] (+ shoup)
    tw_f_s: jax.Array
    tw_i: jax.Array
    tw_i_s: jax.Array
    st_f: jax.Array       # [logn1, L, n1, 128] (+ shoup)
    st_f_s: jax.Array
    st_i: jax.Array
    st_i_s: jax.Array
    comb7: jax.Array      # [d, L, 1, 128] recombination weights (+ shoup)
    comb7_s: jax.Array
    q_i32: jax.Array      # [L, 1, 1] int32
    qinv_f32: jax.Array   # [L, 1, 1] float32
    q_b: jax.Array        # [L, 1, 1] uint32 (broadcast modulus)


@functools.lru_cache(maxsize=None)
def make_stack_plan(N: int, moduli: tuple) -> StackPlan:
    with jax.ensure_compile_time_eval():
        return _make_stack_plan(N, moduli)


def _make_stack_plan(N: int, moduli: tuple) -> StackPlan:
    assert N % LANES == 0 and (N // LANES) & (N // LANES - 1) == 0
    n1 = N // LANES
    logn1 = n1.bit_length() - 1
    d = max(-(-int(q).bit_length() // 7) for q in moduli)
    lps = [_make_stack_limb(N, int(q), d) for q in moduli]
    stack = lambda key: jnp.stack([lp[key] for lp in lps])
    st_f = jnp.stack([lp["st_f"] for lp in lps], axis=1)
    st_f_s = jnp.stack([lp["st_f_s"] for lp in lps], axis=1)
    st_i = jnp.stack([lp["st_i"] for lp in lps], axis=1)
    st_i_s = jnp.stack([lp["st_i_s"] for lp in lps], axis=1)
    comb7 = jnp.stack([lp["comb7"] for lp in lps], axis=1)[:, :, None, :]
    comb7_s = jnp.stack([lp["comb7_s"] for lp in lps], axis=1)[:, :, None, :]
    qs = np.array([int(q) for q in moduli])
    return StackPlan(
        N=N, moduli=tuple(int(q) for q in moduli), n1=n1, d=d,
        W128f=stack("W128f"), W128i=stack("W128i"),
        tw_f=stack("tw_f"), tw_f_s=stack("tw_f_s"),
        tw_i=stack("tw_i"), tw_i_s=stack("tw_i_s"),
        st_f=st_f, st_f_s=st_f_s, st_i=st_i, st_i_s=st_i_s,
        comb7=comb7, comb7_s=comb7_s,
        q_i32=jnp.asarray(qs.astype(np.int32))[:, None, None],
        qinv_f32=jnp.asarray((1.0 / qs).astype(np.float32))[:, None, None],
        q_b=jnp.asarray(qs.astype(np.uint32))[:, None, None],
    )


def _make_stack_limb(N: int, q: int, d: int) -> dict:
    """Per-limb tables with a FORCED digit count d (same derivation as
    _make_lane_plan, minus the megakernel-only tables)."""
    n1 = N // LANES
    logn1 = n1.bit_length() - 1
    plan = nttmod.make_plan(N, q)
    psi = plan.psi
    om = pow(psi, 2, q)
    om8 = pow(om, n1, q)
    om128 = pow(om, LANES, q)
    i2 = np.arange(LANES)
    k2 = np.arange(LANES)
    i1 = np.arange(n1)

    Wf = (_pow_table(psi, 2 * N, q)[(n1 * i2) % (2 * N)][:, None] *
          _pow_table(om8, LANES, q)[np.outer(i2, k2) % LANES]) % q
    om8_inv = pow(om8, -1, q)
    psi_inv = pow(psi, -1, q)
    ninv = pow(N, -1, q)
    Wi = (_pow_table(om8_inv, LANES, q)[np.outer(k2, i2) % LANES] *
          ((_pow_table(psi_inv, 2 * N, q)[(n1 * i2) % (2 * N)] * ninv) % q
           )[None, :]) % q

    weights = [1 << (7 * u) for u in range(d)]
    W128f = jnp.asarray(nttmod._build_digit_matrix(Wf, q, d, d, weights))
    W128i = jnp.asarray(nttmod._build_digit_matrix(Wi, q, d, d, weights))

    om_pows = _pow_table(om, N, q)
    psi_pows = _pow_table(psi, 2 * N, q)
    tw_f = (psi_pows[i1 % (2 * N)][:, None] *
            om_pows[np.outer(i1, k2) % N]) % q
    om_inv = pow(om, -1, q)
    omi_pows = _pow_table(om_inv, N, q)
    psii_pows = _pow_table(psi_inv, 2 * N, q)
    tw_i = (psii_pows[i1 % (2 * N)][:, None] *
            omi_pows[np.outer(i1, k2) % N]) % q

    shoup_arr = lambda a: ((a.astype(object) << 32) // q).astype(
        np.uint64).astype(np.uint32)

    omp = _pow_table(om128, n1, q)
    ompi = _pow_table(pow(om128, -1, q), n1, q)
    st_f = np.zeros((logn1, n1, 1), dtype=np.uint32)
    st_i = np.zeros((logn1, n1, 1), dtype=np.uint32)
    for s in range(logn1):
        m = 1 << (s + 1)
        for j in range(n1):
            t = j % m
            st_f[s, j, 0] = omp[((t % (m // 2)) * (n1 // m)) % n1]
            st_i[s, j, 0] = ompi[((t % (m // 2)) * (n1 // m)) % n1]
    bcast = lambda a: np.broadcast_to(a, a.shape[:-1] + (LANES,)).copy()
    st_f, st_i = bcast(st_f), bcast(st_i)
    comb7 = np.array([(1 << (7 * v)) % q for v in range(d)], dtype=np.uint32)
    comb7 = np.broadcast_to(comb7[:, None], (d, LANES)).copy()

    return dict(
        W128f=W128f, W128i=W128i,
        tw_f=jnp.asarray(tw_f.astype(np.uint32)),
        tw_f_s=jnp.asarray(shoup_arr(tw_f)),
        tw_i=jnp.asarray(tw_i.astype(np.uint32)),
        tw_i_s=jnp.asarray(shoup_arr(tw_i)),
        st_f=jnp.asarray(st_f), st_f_s=jnp.asarray(shoup_arr(st_f)),
        st_i=jnp.asarray(st_i), st_i_s=jnp.asarray(shoup_arr(st_i)),
        comb7=jnp.asarray(comb7),
        comb7_s=jnp.asarray(shoup_arr(comb7)),
    )


def _sublane_dft_stack(sp: StackPlan, x: jax.Array, inverse: bool
                       ) -> jax.Array:
    """Cyclic DFT-n1 over axis -2 of [..., L, n1, 128], per-limb moduli."""
    n1 = sp.n1
    logn1 = n1.bit_length() - 1
    # static bit-reversal as ONE gather (this variant is XLA-only, no
    # Pallas restriction; a concat of n1 slices explodes compile time at
    # n1 >= 256)
    x = jnp.take(x, jnp.asarray(nttmod.bit_reverse_perm(n1)), axis=-2)
    st = sp.st_i if inverse else sp.st_f
    sts = sp.st_i_s if inverse else sp.st_f_s
    L = len(sp.moduli)
    q = sp.q_b[:, None]                                     # [L, 1, 1, 1]
    for s in range(logn1):
        m = 1 << (s + 1)
        h = m >> 1
        xg = x.reshape(*x.shape[:-2], n1 // m, m, LANES)
        tw = st[s].reshape(L, n1 // m, m, LANES)[..., :h, :]
        tws = sts[s].reshape(L, n1 // m, m, LANES)[..., :h, :]
        u = xg[..., :h, :]
        v = shoup_mul(xg[..., h:, :], tw, tws, q)
        x = jnp.concatenate([add_mod(u, v, q), sub_mod(u, v, q)],
                            axis=-2).reshape(*x.shape[:-2], n1, LANES)
    return x


def _recombine_stack(sp: StackPlan, o: jax.Array) -> jax.Array:
    """[..., L, n1, d*128] int32 matmul output -> [..., L, n1, 128] uint32.

    Per-plane reduction: accumulators are bounded by d*128*127^2 < 2^30
    for d <= 5, so reduce_i32_arr is exact for every 31-bit limb."""
    from .modmath import reduce_i32_arr
    L_ = LANES
    p = lambda v: o[..., v * L_:(v + 1) * L_]
    r = reduce_i32_arr(p(0), sp.q_i32, sp.qinv_f32)
    for v in range(1, sp.d):
        term = shoup_mul(reduce_i32_arr(p(v), sp.q_i32, sp.qinv_f32),
                         sp.comb7[v], sp.comb7_s[v], sp.q_b)
        r = add_mod(r, term, sp.q_b)
    return r


def _lane_matmul_stack(planes: jax.Array, W: jax.Array) -> jax.Array:
    """[..., L, n1, d*128] int8 x [L, d*128, d*128] -> [..., L, n1, d*128]
    int32, batched over the limb axis."""
    lead = planes.shape[:-3]
    Lq, n1, K = planes.shape[-3:]
    flat = planes.reshape(-1, Lq, n1, K)
    o = jax.lax.dot_general(
        flat, W,
        dimension_numbers=(((3,), (1,)), ((1,), (0,))),
        preferred_element_type=jnp.int32)                   # [L, B, n1, K2]
    o = jnp.moveaxis(o, 0, 1)
    return o.reshape(*lead, Lq, n1, W.shape[2])


def forward_lane_stack(sp: StackPlan, x: jax.Array) -> jax.Array:
    """[..., L, n1, 128] uint32 COEFF-interleaved -> EVAL-natural."""
    planes = _decompose_u32(x, sp.d)
    o = _lane_matmul_stack(planes, sp.W128f)
    y = _recombine_stack(sp, o)
    y = shoup_mul(y, sp.tw_f, sp.tw_f_s, sp.q_b)
    return _sublane_dft_stack(sp, y, inverse=False)


def inverse_lane_stack(sp: StackPlan, x: jax.Array) -> jax.Array:
    """[..., L, n1, 128] EVAL-natural -> COEFF-interleaved."""
    u = _sublane_dft_stack(sp, x, inverse=True)
    v = shoup_mul(u, sp.tw_i, sp.tw_i_s, sp.q_b)
    planes = _decompose_u32(v, sp.d)
    o = _lane_matmul_stack(planes, sp.W128i)
    return _recombine_stack(sp, o)
