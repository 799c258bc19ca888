"""Advanced SHE: EvalSum, inner products, linear weighted sums, polynomial
and Chebyshev series evaluation, linear transforms.

Reference semantics: /root/reference/src/pke/lib/schemebase/
base-advancedshe.cpp (EvalSum via log-rotations :~, EvalInnerProduct,
EvalLinearWSum) and ckksrns-advancedshe.cpp (EvalPolyLinear,
EvalChebyshevSeries); API surface cryptocontext.h:2708-2807.

CKKS level/scale alignment follows the FLEXIBLEAUTO pattern
(rns-leveledshe.cpp EvalMult auto-adjust :182-191): ciphertexts are
brought to a common basis by scalar-adjusted rescales before adds.
"""

from __future__ import annotations

import numpy as np

from ..lattice import rns
from . import rlwe
from .ckks import CkksContext, Ciphertext


# ---------------------------------------------------------------------------
# level/scale alignment (FLEXIBLEAUTO)
# ---------------------------------------------------------------------------

def adjust_to(ctx: CkksContext, ct: Ciphertext, target_mods: tuple,
              target_scale: float) -> Ciphertext:
    """Bring ct to the target basis with (approximately) the target scale:
    LevelReduce (drop limbs, value-preserving) down to one level above,
    then one scalar-adjusted rescale (the reference's
    AdjustLevelsAndDepth, rns-leveledshe.cpp).  A plain rescale here would
    divide the scale below 1 and destroy the message.  One level =
    composite_degree limbs (COMPOSITESCALING)."""
    cd = ctx.params.composite_degree
    assert len(ct.moduli) >= len(target_mods)
    if len(ct.moduli) > len(target_mods) + cd:
        drop = len(ct.moduli) - (len(target_mods) + cd)
        ct = Ciphertext(rns.level_reduce(ct.c0, drop),
                        rns.level_reduce(ct.c1, drop), ct.scale)
    if len(ct.moduli) == len(target_mods) + cd:
        q_block = 1.0
        for q in ct.moduli[-cd:]:
            q_block *= float(q)
        c = max(1, round(target_scale * q_block / ct.scale))
        ct = Ciphertext(rns.mul_scalar(ct.c0, c), rns.mul_scalar(ct.c1, c),
                        ct.scale * c)
        ct = ctx.rescale(ct)
    return ct


def _match_scales(ctx: CkksContext, a: Ciphertext, b: Ciphertext
                  ) -> tuple[Ciphertext, Ciphertext]:
    """Exactly align the scales of two same-basis ciphertexts.

    Same-level ciphertexts reached by different multiplication paths carry
    scales differing by the relative offsets of the rescale prime blocks
    from 2^scale_bits (~1e-4): force-relabeling would inject that as
    message error.  Instead multiply both sides by small integers u, v
    with u*a.scale ~= v*b.scale (continued-fraction approximation), which
    is exact up to ~2^-24 relative at the cost of <= 24 bits of headroom."""
    from fractions import Fraction
    if abs(a.scale - b.scale) <= 1e-12 * a.scale:
        return a, Ciphertext(b.c0, b.c1, a.scale)
    # headroom-aware limit: values grow by <= limit.  With FLEXIBLEAUTO
    # level-target scales (ckks.level_scale) this path is a rare safety
    # net, so a small cap suffices and bounds scale inflation.
    q_bits = sum(int(q).bit_length() for q in a.moduli)
    slack = q_bits - ctx.params.scale_bits - 8
    limit = 1 << max(2, min(16, slack // 2))
    frac = Fraction(b.scale / a.scale).limit_denominator(limit)
    u, v = frac.numerator, frac.denominator
    if u <= 0 or v <= 0 or max(u, v) > limit * 4:
        return a, Ciphertext(b.c0, b.c1, a.scale)   # degenerate: relabel
    a2 = Ciphertext(rns.mul_scalar(a.c0, u), rns.mul_scalar(a.c1, u),
                    a.scale * u)
    b2 = Ciphertext(rns.mul_scalar(b.c0, v), rns.mul_scalar(b.c1, v),
                    a.scale * u)
    return a2, b2


def add_aligned(ctx: CkksContext, a: Ciphertext, b: Ciphertext) -> Ciphertext:
    """Add with automatic level/scale matching."""
    if len(a.moduli) > len(b.moduli):
        a = adjust_to(ctx, a, b.moduli, b.scale)
    elif len(b.moduli) > len(a.moduli):
        b = adjust_to(ctx, b, a.moduli, a.scale)
    a, b = _match_scales(ctx, a, b)
    return ctx.add(a, b)


def mul_aligned(ctx: CkksContext, a: Ciphertext, b: Ciphertext,
                evk: rlwe.EvalKey) -> Ciphertext:
    if len(a.moduli) > len(b.moduli):
        a = adjust_to(ctx, a, b.moduli, b.scale)
    elif len(b.moduli) > len(a.moduli):
        b = adjust_to(ctx, b, a.moduli, a.scale)
    return ctx.rescale(ctx.mul(a, b, evk))


# ---------------------------------------------------------------------------
# rotations-based aggregation
# ---------------------------------------------------------------------------

def sum_key_gen(ctx: CkksContext, sk, rng, batch: int | None = None) -> dict:
    """Rotation keys for EvalSum's log tree (EvalSumKeyGen)."""
    slots = batch or ctx.params.N // 2
    rots = [1 << i for i in range(int(np.log2(slots)))]
    return ctx.rotation_key_gen(sk, rots, rng)


def eval_sum(ctx: CkksContext, ct: Ciphertext, batch: int,
             rot_keys: dict) -> Ciphertext:
    """Sum the first `batch` slots into every slot (EvalSum: log2(batch)
    rotate-and-add rounds)."""
    assert batch & (batch - 1) == 0
    out = ct
    r = 1
    while r < batch:
        out = ctx.add(out, ctx.rotate(out, r, rot_keys))
        r <<= 1
    return out


def eval_inner_product(ctx: CkksContext, a: Ciphertext, b: Ciphertext,
                       batch: int, evk: rlwe.EvalKey,
                       rot_keys: dict) -> Ciphertext:
    """<a, b> over the first `batch` slots (EvalInnerProduct)."""
    prod = mul_aligned(ctx, a, b, evk)
    return eval_sum(ctx, prod, batch, rot_keys)


def eval_linear_wsum(ctx: CkksContext, cts: list[Ciphertext],
                     weights) -> Ciphertext:
    """sum_i w_i * ct_i for real weights (EvalLinearWSum)."""
    acc = None
    for ct, w in zip(cts, weights):
        term = ctx.mul_plain(ct, np.full(ctx.params.N // 2, float(w)))
        acc = term if acc is None else add_aligned(ctx, acc, term)
    return ctx.rescale(acc)


def sum_rows_key_gen(ctx: CkksContext, sk, rng, row_size: int,
                     slots: int | None = None) -> dict:
    """Rotation keys for EvalSumRows (EvalSumRowsKeyGen,
    base-advancedshe.cpp:193): indices row_size * 2^j."""
    s = slots or ctx.params.N // 2
    rots = []
    r = row_size
    while r < s:
        rots.append(r)
        r <<= 1
    return ctx.rotation_key_gen(sk, rots, rng)


def eval_sum_rows(ctx: CkksContext, ct: Ciphertext, row_size: int,
                  rot_keys: dict, slots: int | None = None) -> Ciphertext:
    """Sum the rows of a row-major [numRows, row_size] slot matrix; every
    row of the result holds the column sums (EvalSumRows,
    base-advancedshe.cpp:284 / EvalSum2nComplexRows)."""
    s = slots or ctx.params.N // 2
    out = ct
    r = row_size
    while r < s:
        out = ctx.add(out, ctx.rotate(out, r, rot_keys))
        r <<= 1
    return out


def sum_cols_key_gen(ctx: CkksContext, sk, rng, num_cols: int) -> dict:
    """Keys for EvalSumCols (EvalSumColsKeyGen: EvalSum indices merged
    with the negative spread rotations)."""
    rots = [1 << i for i in range(max(1, int(np.log2(num_cols))))]
    rots += [-(1 << i) for i in range(max(1, int(np.log2(num_cols))))]
    return ctx.rotation_key_gen(sk, sorted(set(rots)), rng)


def eval_sum_cols(ctx: CkksContext, ct: Ciphertext, num_cols: int,
                  rot_keys: dict) -> Ciphertext:
    """Sum each row of a row-major slot matrix with row length num_cols;
    the row sum is replicated across the row (EvalSumCols,
    base-advancedshe.cpp:304: EvalSum over the row + col-0 mask +
    negative-rotation spread)."""
    assert num_cols & (num_cols - 1) == 0
    slots = ctx.params.N // 2
    out = eval_sum(ctx, ct, num_cols, rot_keys)
    mask = np.zeros(slots)
    mask[::num_cols] = 1.0
    out = ctx.rescale(ctx.mul_plain(out, mask))
    r = 1
    while r < num_cols:
        out = ctx.add(out, ctx.rotate(out, -r, rot_keys))
        r <<= 1
    return out


def merge_key_gen(ctx: CkksContext, sk, rng, count: int) -> dict:
    """Negative rotation keys -1..-(count-1) for EvalMerge."""
    return ctx.rotation_key_gen(sk, [-i for i in range(1, count)], rng)


def eval_merge(ctx: CkksContext, cts: list[Ciphertext],
               rot_keys: dict) -> Ciphertext:
    """Merge slot 0 of each ciphertext into one ciphertext: out_i =
    cts[i][0] (EvalMerge, base-advancedshe.cpp:382 -- mask to slot 0,
    rotate to position, add)."""
    slots = ctx.params.N // 2
    mask = np.zeros(slots)
    mask[0] = 1.0
    out = ctx.rescale(ctx.mul_plain(cts[0], mask))
    for i in range(1, len(cts)):
        t = ctx.rescale(ctx.mul_plain(cts[i], mask))
        out = add_aligned(ctx, out, ctx.rotate(t, -i, rot_keys))
    return out


def eval_add_many(ctx: CkksContext, cts: list[Ciphertext]) -> Ciphertext:
    """Binary-tree sum (EvalAddMany, cryptocontext.h)."""
    lvl = list(cts)
    while len(lvl) > 1:
        nxt = [add_aligned(ctx, lvl[i], lvl[i + 1])
               for i in range(0, len(lvl) - 1, 2)]
        if len(lvl) % 2:
            nxt.append(lvl[-1])
        lvl = nxt
    return lvl[0]


def eval_mult_many(ctx: CkksContext, cts: list[Ciphertext],
                   evk: rlwe.EvalKey) -> Ciphertext:
    """Binary-tree product, depth log2(n) (EvalMultMany)."""
    lvl = list(cts)
    while len(lvl) > 1:
        nxt = [mul_aligned(ctx, lvl[i], lvl[i + 1], evk)
               for i in range(0, len(lvl) - 1, 2)]
        if len(lvl) % 2:
            nxt.append(lvl[-1])
        lvl = nxt
    return lvl[0]


def eval_negate(ctx: CkksContext, ct: Ciphertext) -> Ciphertext:
    """EvalNegate."""
    return Ciphertext(rns.neg(ct.c0), rns.neg(ct.c1), ct.scale)


def compress(ctx: CkksContext, ct: Ciphertext,
             towers_left: int = 1) -> Ciphertext:
    """Compress (cryptocontext.h / rns-leveledshe Compress): drop to the
    smallest basis (value-preserving LevelReduce) before transmission or
    decryption -- ciphertext shrinks to towers_left blocks."""
    cd = ctx.cd
    target = towers_left * cd
    drop = len(ct.moduli) - target
    if drop <= 0:
        return ct
    return Ciphertext(rns.level_reduce(ct.c0, drop),
                      rns.level_reduce(ct.c1, drop), ct.scale)


# ---------------------------------------------------------------------------
# polynomial evaluation
# ---------------------------------------------------------------------------

def eval_poly(ctx: CkksContext, ct: Ciphertext, coeffs,
              evk: rlwe.EvalKey) -> Ciphertext:
    """Power-basis polynomial sum_k c_k x^k (EvalPolyLinear): powers built
    by repeated squaring-free linear chain; depth = deg."""
    coeffs = [float(c) for c in coeffs]
    acc = None
    power = None   # x^k ciphertext
    for k, c in enumerate(coeffs):
        if k == 0:
            continue
        power = ct if power is None else mul_aligned(ctx, power, ct, evk)
        if abs(c) < 1e-12:
            continue
        term = ctx.rescale(ctx.mul_plain(
            power, np.full(ctx.params.N // 2, c)))
        acc = term if acc is None else add_aligned(ctx, acc, term)
    if abs(coeffs[0]) > 1e-12:
        const = np.full(ctx.params.N // 2, coeffs[0])
        if acc is None:
            raise ValueError("constant-only polynomial")
        acc = ctx.add_plain(Ciphertext(acc.c0, acc.c1, acc.scale), const)
    return acc


def eval_poly_linear(ctx: CkksContext, ct: Ciphertext, coeffs,
                     evk: rlwe.EvalKey) -> Ciphertext:
    """EvalPolyLinear (cryptocontext.h): explicit name for the linear
    power-chain evaluator."""
    return eval_poly(ctx, ct, coeffs, evk)


def eval_poly_ps(ctx: CkksContext, ct: Ciphertext, coeffs,
                 evk: rlwe.EvalKey) -> Ciphertext:
    """EvalPolyPS (cryptocontext.h / ckksrns-advancedshe.cpp): power-basis
    polynomial at Paterson-Stockmeyer depth.  The monomial coefficients
    are converted EXACTLY to the Chebyshev basis on [-1, 1]
    (poly2cheb is a linear change of basis) and evaluated with the PS
    Chebyshev machinery — O(sqrt(deg)) nonscalar mults, O(log deg)
    depth, same result as the linear chain up to noise."""
    cheb = np.polynomial.chebyshev.poly2cheb(
        np.asarray([complex(c) for c in coeffs]))
    return eval_chebyshev_series_ps(ctx, ct, list(cheb), -1.0, 1.0, evk)


def eval_powers(ctx: CkksContext, ct: Ciphertext, degree: int,
                evk: rlwe.EvalKey) -> list[Ciphertext]:
    """EvalPowers (cryptocontext.h): [x, x^2, ..., x^degree] with x^2k
    built by squaring (log-depth) and odd powers by one multiply."""
    powers: list[Ciphertext | None] = [None] * (degree + 1)
    powers[1] = ct
    for k in range(2, degree + 1):
        if k % 2 == 0:
            powers[k] = ctx.rescale(ctx.square(powers[k // 2], evk))
        else:
            powers[k] = mul_aligned(ctx, powers[k - 1], ct, evk)
    return powers[1:]


def eval_poly_with_precomp(ctx: CkksContext, powers: list[Ciphertext],
                           coeffs, evk: rlwe.EvalKey) -> Ciphertext:
    """EvalPolyWithPrecomp: sum_k c_k x^k over powers from eval_powers
    (powers[k-1] = x^k)."""
    coeffs = [complex(c) for c in coeffs]
    acc = None
    for k, c in enumerate(coeffs[1:], start=1):
        if abs(c) < 1e-12:
            continue
        term = ctx.rescale(ctx.mul_plain(
            powers[k - 1], np.full(ctx.params.N // 2, c)))
        acc = term if acc is None else add_aligned(ctx, acc, term)
    if acc is None:
        raise ValueError("constant-only polynomial")
    if abs(coeffs[0]) > 1e-12:
        acc = ctx.add_plain(acc, np.full(ctx.params.N // 2, coeffs[0]))
    return acc


def eval_chebyshev_series(ctx: CkksContext, ct: Ciphertext, coeffs,
                          a: float, b: float,
                          evk: rlwe.EvalKey) -> Ciphertext:
    """sum_k c_k T_k(y), y = (2x - a - b)/(b - a) (EvalChebyshevSeries,
    linear three-term recurrence T_{k+1} = 2 y T_k - T_{k-1}; the
    Paterson-Stockmeyer variant is planned for large degrees).

    Coefficients may be complex (CKKS slots are complex): used by the
    functional-bootstrap exp(2*pi*i*x) stage (fbt.py)."""
    coeffs = [complex(c) for c in coeffs]
    slots = ctx.params.N // 2
    if (a, b) == (-1.0, 1.0):
        y = ct          # domain already normalized; save one level
    else:
        # y = alpha*x + beta
        alpha = 2.0 / (b - a)
        beta = -(a + b) / (b - a)
        y = ctx.rescale(ctx.mul_plain(ct, np.full(slots, alpha)))
        y = ctx.add_plain(y, np.full(slots, beta))

    t_prev = None          # T_0 handled as plaintext 1
    t_cur = y              # T_1
    acc = ctx.rescale(ctx.mul_plain(y, np.full(slots, coeffs[1]))) \
        if len(coeffs) > 1 else None
    for k in range(2, len(coeffs)):
        two_y_t = mul_aligned(ctx, y, t_cur, evk)
        two_y_t = Ciphertext(rns.mul_scalar(two_y_t.c0, 2),
                             rns.mul_scalar(two_y_t.c1, 2), two_y_t.scale)
        if t_prev is None:
            # T_2 = 2 y T_1 - T_0, T_0 = 1
            t_next = ctx.add_plain(two_y_t, np.full(slots, -1.0))
        else:
            t_next = add_aligned(
                ctx, two_y_t,
                Ciphertext(rns.neg(t_prev.c0), rns.neg(t_prev.c1),
                           t_prev.scale))
        t_prev, t_cur = t_cur, t_next
        if abs(coeffs[k]) > 1e-12:
            term = ctx.rescale(ctx.mul_plain(
                t_cur, np.full(slots, coeffs[k])))
            acc = term if acc is None else add_aligned(ctx, acc, term)
    if abs(coeffs[0]) > 1e-12 and acc is not None:
        acc = ctx.add_plain(acc, np.full(slots, coeffs[0]))
    return acc


def _cheb_divmod(c: list, g: int):
    """Divide sum c_i T_i by T_g in the Chebyshev basis:
    returns (q, r) with f = q * T_g + r, deg(r) < g.
    Uses T_i = 2 T_g T_{i-g} - T_{|i-2g|}."""
    work = list(c)
    n = len(work) - 1
    q = [0.0] * (n - g + 1)
    for i in range(n, g, -1):
        if work[i] == 0.0:
            continue
        q[i - g] += 2.0 * work[i]
        work[abs(i - 2 * g)] -= work[i]
        work[i] = 0.0
    q[0] += work[g]
    work[g] = 0.0
    return q, work[:g]


def eval_chebyshev_series_ps(ctx: CkksContext, ct: Ciphertext, coeffs,
                             a: float, b: float,
                             evk: rlwe.EvalKey) -> Ciphertext:
    """Paterson-Stockmeyer Chebyshev evaluation (EvalChebyshevSeriesPS,
    ckksrns-advancedshe.cpp): depth ~ log2(deg) instead of deg.

    Precomputes baby steps T_1..T_k and giant steps T_{2^j k}, then
    recursively splits f = q*T_g + r.  Coefficients may be complex
    (fbt.py exp stage)."""
    coeffs = [complex(c) for c in coeffs]
    while len(coeffs) > 1 and abs(coeffs[-1]) < 1e-14:
        coeffs.pop()
    deg = len(coeffs) - 1
    slots = ctx.params.N // 2

    if deg <= 2:
        return eval_chebyshev_series(ctx, ct, coeffs, a, b, evk)

    if (a, b) == (-1.0, 1.0):
        y = ct          # domain already normalized; save one level
    else:
        alpha = 2.0 / (b - a)
        beta = -(a + b) / (b - a)
        y = ctx.rescale(ctx.mul_plain(ct, np.full(slots, alpha)))
        y = ctx.add_plain(y, np.full(slots, beta))

    k = max(2, int(np.sqrt((deg + 1) / 2.0) + 0.5))
    # babies T_1..T_k
    T = {1: y}
    for i in range(2, k + 1):
        half = i // 2
        other = i - half
        prod = mul_aligned(ctx, T[half], T[other], evk)
        prod = Ciphertext(rns.mul_scalar(prod.c0, 2),
                          rns.mul_scalar(prod.c1, 2), prod.scale)
        d = abs(half - other)     # T_a T_b = (T_{a+b} + T_{|a-b|})/2
        if d == 0:
            T[i] = ctx.add_plain(prod, np.full(slots, -1.0))
        else:
            T[i] = add_aligned(ctx, prod, Ciphertext(
                rns.neg(T[d].c0), rns.neg(T[d].c1), T[d].scale))
    # giants T_{2k}, T_{4k}, ...
    g = k
    while 2 * g <= deg:
        sq = mul_aligned(ctx, T[g], T[g], evk)
        sq = Ciphertext(rns.mul_scalar(sq.c0, 2),
                        rns.mul_scalar(sq.c1, 2), sq.scale)
        T[2 * g] = ctx.add_plain(sq, np.full(slots, -1.0))
        g *= 2

    def emit(cs: list) -> Ciphertext | None:
        """Evaluate sum cs_i T_i as a ciphertext (None if ~zero)."""
        d = len(cs) - 1
        while d > 0 and abs(cs[d]) < 1e-14:
            d -= 1
        cs = cs[:d + 1]
        if d <= k:
            acc = None
            for i in range(1, d + 1):
                if abs(cs[i]) < 1e-14:
                    continue
                term = ctx.rescale(ctx.mul_plain(
                    T[i], np.full(slots, cs[i])))
                acc = term if acc is None else add_aligned(ctx, acc, term)
            if abs(cs[0]) > 1e-14:
                if acc is None:
                    acc = ctx.rescale(ctx.mul_plain(
                        T[1], np.full(slots, 0.0)))
                acc = ctx.add_plain(acc, np.full(slots, cs[0]))
            return acc
        gg = k
        while 2 * gg <= d:
            gg *= 2
        q, r = _cheb_divmod(cs, gg)
        cq = emit(q)
        cr = emit(r)
        if cq is None:
            return cr
        prod = mul_aligned(ctx, cq, T[gg], evk)
        return prod if cr is None else add_aligned(ctx, prod, cr)

    out = emit(coeffs)
    return out


# ---------------------------------------------------------------------------
# linear transforms (matrix x slot-vector, BSGS)
# ---------------------------------------------------------------------------

def eval_linear_transform(ctx: CkksContext, ct: Ciphertext, M: np.ndarray,
                          rot_keys: dict) -> Ciphertext:
    """y = M @ slots(ct) via the diagonal method: y = sum_d diag_d(M) *
    rot(ct, d) (the dense-matrix EvalLinearTransform used by CKKS
    bootstrapping's CoeffsToSlots when the level budget is 1)."""
    n = M.shape[0]
    acc = None
    for d in range(n):
        diag = np.array([M[i, (i + d) % n] for i in range(n)])
        if not np.any(np.abs(diag) > 1e-12):
            continue
        rct = ct if d == 0 else ctx.rotate(ct, d, rot_keys)
        term = ctx.mul_plain(rct, diag)
        acc = term if acc is None else ctx.add(acc, term)
    return ctx.rescale(acc)


# ---------------------------------------------------------------------------
# function evaluation conveniences (cryptocontext.cpp:497-525)
# ---------------------------------------------------------------------------

def eval_chebyshev_function(ctx: CkksContext, func, ct: Ciphertext,
                            a: float, b: float, degree: int,
                            evk: rlwe.EvalKey) -> Ciphertext:
    """EvalChebyshevFunction: fit func on [a,b] at Chebyshev nodes of the
    given degree, then evaluate the series (Paterson-Stockmeyer)."""
    from ..math.approx import chebyshev_coefficients
    coeffs = chebyshev_coefficients(func, a, b, degree)
    return eval_chebyshev_series_ps(ctx, ct, coeffs, a, b, evk)


def eval_sin(ctx, ct, a, b, degree, evk):
    """EvalSin (cryptocontext.cpp:505)."""
    return eval_chebyshev_function(ctx, np.sin, ct, a, b, degree, evk)


def eval_cos(ctx, ct, a, b, degree, evk):
    """EvalCos (cryptocontext.cpp:511)."""
    return eval_chebyshev_function(ctx, np.cos, ct, a, b, degree, evk)


def eval_logistic(ctx, ct, a, b, degree, evk):
    """EvalLogistic: 1/(1+exp(-x)) (cryptocontext.cpp:517)."""
    return eval_chebyshev_function(ctx, lambda x: 1.0 / (1.0 + np.exp(-x)),
                                   ct, a, b, degree, evk)


def eval_divide(ctx, ct, a, b, degree, evk):
    """EvalDivide: 1/x on [a,b], 0 < a < b or a < b < 0
    (cryptocontext.cpp:523)."""
    return eval_chebyshev_function(ctx, lambda x: 1.0 / x, ct, a, b,
                                   degree, evk)
