"""RNS (double-CRT) polynomial layer: the TPU analogue of DCRTPoly.

Reference semantics: /root/reference/src/core/include/lattice/hal/default/
dcrtpoly.h:59 (DCRTPolyImpl) and dcrtpoly-impl.h:910-1030 (ApproxSwitchCRT
Basis / ApproxModUp / ApproxModDown / SwitchCRTBasis), re-architected for
TPU:

* a ring element is one uint32 tensor [..., L, N] (limb-major, coefficients
  on the 128-lane axis) instead of a vector of per-modulus objects;
* every limb's NTT tables are stacked so all limbs transform in ONE batched
  MXU matmul / butterfly pass (per-limb moduli broadcast as [L, 1] arrays);
* CRT basis changes contract the limb axis with Montgomery-form constant
  matrices -- the reference's per-coefficient loops become one einsum-like
  vectorized op.

Format tracking (COEFFICIENT vs EVALUATION) is a static field, so format
errors are caught at trace time.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..math import ntt as nttmod
from ..math import primes
from ..math.modmath import (U32, u32, add_mod, sub_mod, neg_mod, mont_mul,
                            mont_constants, shoup_mul, shoup_precompute)

COEFF = "COEFF"
EVAL = "EVAL"


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RnsPlan:
    """Stacked per-limb NTT plans + modular constants for a basis {q_i}."""
    N: int = dataclasses.field(metadata=dict(static=True))
    moduli: tuple = dataclasses.field(metadata=dict(static=True))
    # [L] per-limb scalars
    q_arr: jax.Array          # uint32 moduli
    qinv_neg: jax.Array       # -q^-1 mod 2^32
    r2: jax.Array             # 2^64 mod q (to-Montgomery constant)
    ninv: jax.Array
    ninv_s: jax.Array
    # [L, N] stacked butterfly tables
    fwd_w: jax.Array
    fwd_ws: jax.Array
    inv_w: jax.Array
    inv_ws: jax.Array
    br: jax.Array             # [N] bit reversal (same for all limbs)

    @property
    def L(self) -> int:
        return len(self.moduli)


@functools.lru_cache(maxsize=None)
def make_rns_plan(N: int, moduli: tuple) -> RnsPlan:
    # ensure_compile_time_eval: this cache is often first populated from
    # inside a jit trace; without it the jnp constants leak as tracers
    with jax.ensure_compile_time_eval():
        return _make_rns_plan(N, moduli)


def _make_rns_plan(N: int, moduli: tuple) -> RnsPlan:
    plans = [nttmod.make_plan(N, q) for q in moduli]
    stk = lambda f: jnp.stack([f(p) for p in plans])
    return RnsPlan(
        N=N, moduli=tuple(moduli),
        q_arr=jnp.asarray(np.array(moduli, dtype=np.uint32)),
        qinv_neg=jnp.asarray(np.array([p.qinv_neg for p in plans], np.uint32)),
        r2=jnp.asarray(np.array([p.r2 for p in plans], np.uint32)),
        ninv=stk(lambda p: p.ninv), ninv_s=stk(lambda p: p.ninv_s),
        fwd_w=stk(lambda p: p.fwd_w), fwd_ws=stk(lambda p: p.fwd_ws),
        inv_w=stk(lambda p: p.inv_w), inv_ws=stk(lambda p: p.inv_ws),
        br=plans[0].br,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RnsPoly:
    """[..., L, N] uint32 ring element over basis `moduli`, in `fmt`."""
    data: jax.Array
    moduli: tuple = dataclasses.field(metadata=dict(static=True))
    fmt: str = dataclasses.field(metadata=dict(static=True), default=EVAL)

    @property
    def N(self) -> int:
        return self.data.shape[-1]

    @property
    def L(self) -> int:
        return self.data.shape[-2]

    @property
    def plan(self) -> RnsPlan:
        return make_rns_plan(self.N, self.moduli)

    def _q(self):
        """Per-limb modulus broadcast shape [L, 1]."""
        return self.plan.q_arr[:, None]


def _qb(plan: RnsPlan):
    return plan.q_arr[:, None]


# ---------------------------------------------------------------------------
# batched multi-modulus butterflies (all limbs at once)
# ---------------------------------------------------------------------------

def _lane_stack_ok(plan: RnsPlan) -> bool:
    """The stacked-limb lane-factored NTT (ntt_lane.StackPlan) applies for
    N = n1*128, n1 a power of two >= 2, all limbs < 2^31."""
    N = plan.N
    n1 = N // 128
    return (N % 128 == 0 and n1 >= 2 and (n1 & (n1 - 1)) == 0
            and all(int(q) < (1 << 31) for q in plan.moduli))


import os as _os

# Trace-time NTT implementation override, read ONCE at import: jitted
# callers capture the choice in their trace, so a post-import env change
# could not take effect anyway (it would only make eager/jit disagree).
_RNS_NTT_ENV = _os.environ.get("FHE_RNS_NTT")
if _RNS_NTT_ENV not in (None, "", "lane", "butterfly"):
    raise ValueError(
        f"FHE_RNS_NTT={_RNS_NTT_ENV!r}: expected 'lane' or 'butterfly'")


def _rns_impl(plan: RnsPlan) -> str:
    if _RNS_NTT_ENV:
        return _RNS_NTT_ENV
    from ..math.ntt import _use_mxu
    if _use_mxu() and _lane_stack_ok(plan):
        return "lane"
    return "butterfly"


def ntt_forward_lane(plan: RnsPlan, x: jax.Array) -> jax.Array:
    """Stacked-limb lane-factored forward NTT (128-point DFT factor as a
    limb-batched int8 MXU matmul, n1 factor as sublane butterflies) --
    bit-exact vs the butterfly path; natural [..., L, N] layouts at the
    boundary."""
    from ..math import ntt_lane as nl
    sp = nl.make_stack_plan(plan.N, tuple(int(q) for q in plan.moduli))
    return nl.blocked_to_eval(nl.forward_lane_stack(
        sp, nl.coeff_to_interleaved(x, sp.n1)))


def ntt_inverse_lane(plan: RnsPlan, x: jax.Array) -> jax.Array:
    from ..math import ntt_lane as nl
    sp = nl.make_stack_plan(plan.N, tuple(int(q) for q in plan.moduli))
    return nl.interleaved_to_coeff(nl.inverse_lane_stack(
        sp, nl.eval_to_blocked(x, sp.n1)))


def ntt_forward(plan: RnsPlan, x: jax.Array, impl: str | None = None
                ) -> jax.Array:
    """[..., L, N] COEFF -> EVAL, per-limb moduli."""
    impl = impl or _rns_impl(plan)
    if impl == "lane" and _lane_stack_ok(plan):
        return ntt_forward_lane(plan, x)
    N = plan.N
    L = len(plan.moduli)
    logN = N.bit_length() - 1
    lead = x.shape[:-2]
    x = x.reshape(-1, L, N)
    q = plan.q_arr[None, :, None, None]
    for s in range(logN):
        m = 1 << s
        t = N >> (s + 1)
        xv = x.reshape(-1, L, m, 2, t)
        tw = jax.lax.dynamic_slice_in_dim(plan.fwd_w, m, m, axis=1)
        tws = jax.lax.dynamic_slice_in_dim(plan.fwd_ws, m, m, axis=1)
        tw = tw[None, :, :, None]
        tws = tws[None, :, :, None]
        u = xv[:, :, :, 0, :]
        v = shoup_mul(xv[:, :, :, 1, :], tw, tws, q)
        x = jnp.stack([add_mod(u, v, q), sub_mod(u, v, q)],
                      axis=3).reshape(-1, L, N)
    x = jnp.take(x, plan.br, axis=-1)
    return x.reshape(*lead, L, N)


def ntt_inverse(plan: RnsPlan, x: jax.Array, impl: str | None = None
                ) -> jax.Array:
    """[..., L, N] EVAL -> COEFF, per-limb moduli."""
    impl = impl or _rns_impl(plan)
    if impl == "lane" and _lane_stack_ok(plan):
        return ntt_inverse_lane(plan, x)
    N = plan.N
    L = len(plan.moduli)
    logN = N.bit_length() - 1
    lead = x.shape[:-2]
    x = x.reshape(-1, L, N)
    x = jnp.take(x, plan.br, axis=-1)
    q = plan.q_arr[None, :, None, None]
    for s in range(logN):
        h = N >> (s + 1)
        t = 1 << s
        xv = x.reshape(-1, L, h, 2, t)
        tw = jax.lax.dynamic_slice_in_dim(plan.inv_w, h, h, axis=1)
        tws = jax.lax.dynamic_slice_in_dim(plan.inv_ws, h, h, axis=1)
        tw = tw[None, :, :, None]
        tws = tws[None, :, :, None]
        u = xv[:, :, :, 0, :]
        v = xv[:, :, :, 1, :]
        lo = add_mod(u, v, q)
        hi = shoup_mul(sub_mod(u, v, q), tw, tws, q)
        x = jnp.stack([lo, hi], axis=3).reshape(-1, L, N)
    qn = plan.q_arr[None, :, None]
    x = shoup_mul(x, plan.ninv[None, :, None], plan.ninv_s[None, :, None], qn)
    return x.reshape(*lead, L, N)


# ---------------------------------------------------------------------------
# element ops
# ---------------------------------------------------------------------------

def to_eval(p: RnsPoly) -> RnsPoly:
    if p.fmt == EVAL:
        return p
    return RnsPoly(ntt_forward(p.plan, p.data), p.moduli, EVAL)


def to_coeff(p: RnsPoly) -> RnsPoly:
    if p.fmt == COEFF:
        return p
    return RnsPoly(ntt_inverse(p.plan, p.data), p.moduli, COEFF)


def _binop(a: RnsPoly, b: RnsPoly, op):
    assert a.moduli == b.moduli and a.fmt == b.fmt, (a.moduli, b.moduli,
                                                     a.fmt, b.fmt)
    return RnsPoly(op(a.data, b.data, a._q()), a.moduli, a.fmt)


def add(a: RnsPoly, b: RnsPoly) -> RnsPoly:
    return _binop(a, b, add_mod)


def sub(a: RnsPoly, b: RnsPoly) -> RnsPoly:
    return _binop(a, b, sub_mod)


def neg(a: RnsPoly) -> RnsPoly:
    return RnsPoly(neg_mod(a.data, a._q()), a.moduli, a.fmt)


def mul(a: RnsPoly, b: RnsPoly) -> RnsPoly:
    """Pointwise product (EVALUATION format required)."""
    assert a.fmt == EVAL and b.fmt == EVAL and a.moduli == b.moduli
    plan = a.plan
    bm = mont_mul(b.data, plan.r2[:, None], _qb(plan), plan.qinv_neg[:, None])
    out = mont_mul(a.data, bm, _qb(plan), plan.qinv_neg[:, None])
    return RnsPoly(out, a.moduli, EVAL)


def mul_mont(a: RnsPoly, b_mont: jax.Array) -> RnsPoly:
    """Pointwise product against Montgomery-form raw data (key material)."""
    assert a.fmt == EVAL
    plan = a.plan
    out = mont_mul(a.data, b_mont, _qb(plan), plan.qinv_neg[:, None])
    return RnsPoly(out, a.moduli, EVAL)


def mul_scalar(a: RnsPoly, c) -> RnsPoly:
    """Multiply by integer scalar(s): c is a host int or [L] uint32 residues."""
    plan = a.plan
    if isinstance(c, int):
        c = np.array([c % q for q in a.moduli], dtype=np.uint32)
        c = jnp.asarray(c)
    cm = mont_mul(c[:, None], plan.r2[:, None], _qb(plan),
                  plan.qinv_neg[:, None])
    out = mont_mul(a.data, cm, _qb(plan), plan.qinv_neg[:, None])
    return RnsPoly(out, a.moduli, a.fmt)


def automorphism(p: RnsPoly, k: int) -> RnsPoly:
    """a(X) -> a(X^k) for odd k (EvalAutomorphism index permutation).

    In natural-order EVALUATION: out[i] = in[pi(i)] where the point
    psi^(2i+1) maps to psi^((2i+1)k mod 2N)."""
    assert p.fmt == EVAL
    N = p.N
    k = k % (2 * N)
    assert k % 2 == 1
    # out index i takes value a(psi^{(2i+1)k}) = in[j] with 2j+1 = (2i+1)k mod 2N,
    # sign: if (2i+1)k mod 4N >= 2N the point is psi^{e-2N} = -psi^e? No--
    # psi has order 2N so exponents are mod 2N and j = ((2i+1)k mod 2N - 1)/2.
    i = np.arange(N, dtype=np.int64)
    e = ((2 * i + 1) * k) % (2 * N)
    j = ((e - 1) // 2).astype(np.int32)
    perm = jnp.asarray(j)
    return RnsPoly(jnp.take(p.data, perm, axis=-1), p.moduli, EVAL)


# ---------------------------------------------------------------------------
# CRT basis arithmetic (host constants)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _basis_consts(from_mods: tuple, to_mods: tuple):
    """Constants for ApproxSwitchCRTBasis {q_i} -> {p_j}:
    qhat_inv[i]  = (Q/q_i)^-1 mod q_i      (Montgomery form)
    qhat_to[i,j] = (Q/q_i) mod p_j         (Montgomery form wrt p_j)
    """
    Q = 1
    for q in from_mods:
        Q *= q
    L, M = len(from_mods), len(to_mods)
    qhat_inv = np.zeros(L, dtype=np.uint32)
    qhat_to = np.zeros((L, M), dtype=np.uint32)
    for i, qi in enumerate(from_mods):
        qhat = Q // qi
        qhat_inv[i] = (pow(qhat % qi, -1, qi) << 32) % qi
        for j, pj in enumerate(to_mods):
            qhat_to[i, j] = ((qhat % pj) << 32) % pj
    # host numpy on purpose: lru_cache + trace-created constants leak tracers
    return qhat_inv, qhat_to


def switch_crt_basis_approx(p: RnsPoly, to_mods: tuple) -> RnsPoly:
    """ApproxSwitchCRTBasis (dcrtpoly-impl.h:910): out_j = sum_i
    [x_i * (Q/q_i)^-1 mod q_i] * (Q/q_i) mod p_j.  COEFFICIENT format.

    'Approx': the result equals x + u*Q for a small integer u in [0, L)
    (no exact rounding), exactly as the reference."""
    assert p.fmt == COEFF
    plan = p.plan
    to_plan = make_rns_plan(p.N, to_mods)
    qhat_inv_np, qhat_to_np = _basis_consts(p.moduli, to_mods)
    qhat_inv, qhat_to = jnp.asarray(qhat_inv_np), jnp.asarray(qhat_to_np)
    # y_i = x_i * qhat_inv_i mod q_i  (mont constant -> plain result)
    y = mont_mul(p.data, qhat_inv[:, None], _qb(plan),
                 plan.qinv_neg[:, None])                    # [..., L, N]
    # out_j = sum_i y_i * qhat_to[i, j] mod p_j
    pq = to_plan.q_arr[:, None]                             # [M, 1]
    pinv = to_plan.qinv_neg[:, None]
    # reduce y_i mod p_j first (y_i < q_i may exceed p_j)
    terms = mont_mul(y[..., :, None, :], qhat_to[:, :, None], pq, pinv)
    acc = terms[..., 0, :, :]
    for i in range(1, len(p.moduli)):
        acc = add_mod(acc, terms[..., i, :, :], pq)
    return RnsPoly(acc, to_mods, COEFF)


def switch_crt_basis_exact(p: RnsPoly, to_mods: tuple,
                           centered: bool = False) -> RnsPoly:
    """Exact CRT basis switch (HPS fast base conversion with correction):
    out_j = sum_i y_i * (Q/q_i) - v*Q mod p_j with v = floor(sum y_i/q_i)
    (or round(...) if centered, lifting the [-Q/2, Q/2) representative) --
    the reference's SwitchCRTBasis (dcrtpoly-impl.h:1030) with its float
    correction replaced by 96-bit integer accumulation
    (modmath.fraction_round_v)."""
    assert p.fmt == COEFF
    from ..math.modmath import fraction_round_v, barrett_reduce_u32
    plan = p.plan
    to_plan = make_rns_plan(p.N, to_mods)
    qhat_inv_np, qhat_to_np = _basis_consts(p.moduli, to_mods)
    qhat_inv, qhat_to = jnp.asarray(qhat_inv_np), jnp.asarray(qhat_to_np)
    y = mont_mul(p.data, qhat_inv[:, None], _qb(plan),
                 plan.qinv_neg[:, None])
    v = fraction_round_v(y, p.moduli, centered)    # [..., N], <= L
    pq = to_plan.q_arr[:, None]
    pinv = to_plan.qinv_neg[:, None]
    terms = mont_mul(y[..., :, None, :], qhat_to[:, :, None], pq, pinv)
    acc = terms[..., 0, :, :]
    for i in range(1, len(p.moduli)):
        acc = add_mod(acc, terms[..., i, :, :], pq)
    # subtract v*Q mod p_j: Q mod p_j in Montgomery form
    Q = 1
    for q in p.moduli:
        Q *= q
    qmod = np.array([((Q % pj) << 32) % pj for pj in to_mods],
                    dtype=np.uint32)
    vq = mont_mul(v[..., None, :], jnp.asarray(qmod)[:, None], pq, pinv)
    return RnsPoly(sub_mod(acc, vq, pq), to_mods, COEFF)


def scale_and_round_t_over_q(p: RnsPoly, q_mods: tuple, r_mods: tuple,
                             t: int) -> RnsPoly:
    """round(t * V / Q) mod R for V over the Q+R basis (BFV HPS
    ScaleAndRound, dcrtpoly.h:279-301).

    Computed as floor((tV + floor(Q/2)) / Q) = (y - [y]_Q) / Q with
    y = tV + floor(Q/2): [y]_Q comes from the Q limbs and is carried to R
    by the exact basis switch."""
    assert p.fmt == COEFF and p.moduli == tuple(q_mods) + tuple(r_mods)
    Lq = len(q_mods)
    Q = 1
    for q in q_mods:
        Q *= q
    half = Q // 2
    # y = t*V + half on every limb
    y = mul_scalar(p, t)
    halves = np.array([half % m for m in p.moduli], dtype=np.uint32)
    y = RnsPoly(add_mod(y.data, jnp.asarray(halves)[:, None], y._q()),
                y.moduli, COEFF)
    y_q = RnsPoly(y.data[..., :Lq, :], tuple(q_mods), COEFF)
    y_r = RnsPoly(y.data[..., Lq:, :], tuple(r_mods), COEFF)
    z_r = switch_crt_basis_exact(y_q, tuple(r_mods))   # [y]_Q mod r
    diff = sub(y_r, z_r)
    qinv = np.array([pow(Q % r, -1, r) for r in r_mods], dtype=np.uint32)
    return mul_scalar(diff, jnp.asarray(qinv))


# ---------------------------------------------------------------------------
# BEHZ (eprint 2016/510) base-conversion kit
# ---------------------------------------------------------------------------

_MTILDE = 1 << 16          # power of two: mod-mtilde arithmetic is masking


@functools.lru_cache(maxsize=None)
def _behz_conv_consts(q_mods: tuple, bsk_mods: tuple):
    """Constants for FastBaseConvqToBskMontgomery (dcrtpoly.h:305-312):
    mtilde folded into the per-limb inverse; q-hat residues in bsk and
    mtilde; the SmMRq correction scalars."""
    Q = 1
    for q in q_mods:
        Q *= q
    L, M = len(q_mods), len(bsk_mods)
    mt = _MTILDE
    mtilde_qhat_inv = np.zeros(L, dtype=np.uint32)      # Mont form wrt q_i
    qhat_bsk = np.zeros((L, M), dtype=np.uint32)        # Mont form wrt b_j
    qhat_mtilde = np.zeros(L, dtype=np.uint32)          # plain, < mtilde
    for i, qi in enumerate(q_mods):
        qhat = Q // qi
        mtilde_qhat_inv[i] = ((mt * pow(qhat % qi, -1, qi) % qi) << 32) % qi
        qhat_mtilde[i] = qhat % mt
        for j, bj in enumerate(bsk_mods):
            qhat_bsk[i, j] = ((qhat % bj) << 32) % bj
    neg_q_inv_mtilde = np.uint32(mt - pow(Q % mt, -1, mt))
    q_bsk = np.array([((Q % bj) << 32) % bj for bj in bsk_mods],
                     dtype=np.uint32)                   # Mont form
    q_bsk_plain = np.array([Q % bj for bj in bsk_mods], dtype=np.uint32)
    mtilde_inv_bsk = np.array([pow(mt % bj, -1, bj) for bj in bsk_mods],
                              dtype=np.uint32)          # plain
    return (mtilde_qhat_inv, qhat_bsk, qhat_mtilde, neg_q_inv_mtilde,
            q_bsk, mtilde_inv_bsk, q_bsk_plain)


def fast_base_conv_q_to_bsk(p: RnsPoly, bsk_mods: tuple) -> RnsPoly:
    """BEHZ FastBaseConvqToBskMontgomery (dcrtpoly.h:305-312; eprint
    2016/510 §3.1): approximate CRT conversion of mtilde*x from q to
    Bsk u {mtilde}, then small Montgomery reduction by mtilde removes
    the alpha*Q conversion error — the result represents x (or x+Q)
    EXACTLY in Bsk.  COEFFICIENT format; one limb-axis contraction."""
    assert p.fmt == COEFF
    plan = p.plan
    bsk_plan = make_rns_plan(p.N, bsk_mods)
    (mqinv_np, qhat_bsk_np, qhat_mt_np, negqinv_mt, q_bsk_np,
     mtinv_np, q_plain_np) = _behz_conv_consts(p.moduli, bsk_mods)
    mt_mask = u32(_MTILDE - 1)
    # y_i = |x_i * mtilde * qhat_i^{-1}|_{q_i}
    y = mont_mul(p.data, jnp.asarray(mqinv_np)[:, None], _qb(plan),
                 plan.qinv_neg[:, None])                 # [..., L, N]
    bq = bsk_plan.q_arr[:, None]
    binv = bsk_plan.qinv_neg[:, None]
    terms = mont_mul(y[..., :, None, :], jnp.asarray(qhat_bsk_np)[:, :, None],
                     bq, binv)
    acc = terms[..., 0, :, :]
    for i in range(1, len(p.moduli)):
        acc = add_mod(acc, terms[..., i, :, :], bq)      # [..., M, N]
    # c_mtilde = sum_i y_i * qhat_i mod mtilde (2^16 | 2^32: uint32 wrap
    # is exact mod mtilde after masking)
    cm = (y * jnp.asarray(qhat_mt_np)[:, None]).sum(
        axis=-2, dtype=U32) & mt_mask
    r = (cm * negqinv_mt) & mt_mask                      # [..., N]
    # out = (acc + Q*r) * mtilde^{-1} - Q*[r >= mtilde/2]  mod b_j
    q_bsk = jnp.asarray(q_bsk_np)[:, None]
    rq = mont_mul(r[..., None, :], q_bsk, bq, binv)      # r*Q mod b_j (plain)
    num = add_mod(acc, rq, bq)
    mtinv_m = mont_mul(jnp.asarray(mtinv_np)[:, None],
                       bsk_plan.r2[:, None], bq, binv)   # Mont form
    out = mont_mul(num, mtinv_m, bq, binv)
    q_plain = jnp.asarray(q_plain_np)[:, None]
    out = jnp.where((r >= u32(_MTILDE // 2))[..., None, :],
                    sub_mod(out, q_plain, bq), out)
    return RnsPoly(out, bsk_mods, COEFF)


def fast_rns_floor_q(x_q: RnsPoly, x_bsk: RnsPoly) -> RnsPoly:
    """BEHZ FastRNSFloorq (dcrtpoly.h FastRNSFloorq; eprint 2016/510
    §3.2): given residues of the SAME integer y in q and Bsk, return
    floor(y/Q) (minus a small alpha < L conversion error) in Bsk."""
    assert x_q.fmt == COEFF and x_bsk.fmt == COEFF
    conv = switch_crt_basis_approx(x_q, x_bsk.moduli)    # |y|_q + alpha*Q
    diff = sub(x_bsk, conv)
    Q = 1
    for q in x_q.moduli:
        Q *= q
    qinv = np.array([pow(Q % b, -1, b) for b in x_bsk.moduli],
                    dtype=np.uint32)
    return mul_scalar(diff, jnp.asarray(qinv))


def fast_base_conv_sk(p: RnsPoly, q_mods: tuple) -> RnsPoly:
    """BEHZ FastBaseConvSK (dcrtpoly.h FastBaseConvSK; Shenoy-Kumaresan):
    exact conversion from Bsk = B u {m_sk} (m_sk = LAST limb) back to q,
    using the m_sk residue to cancel the approximate-conversion alpha*B."""
    assert p.fmt == COEFF
    B_mods = p.moduli[:-1]
    msk = p.moduli[-1]
    x_B = RnsPoly(p.data[..., :-1, :], B_mods, COEFF)
    x_msk = p.data[..., -1, :]                           # [..., N]
    z_q = switch_crt_basis_approx(x_B, tuple(q_mods))    # x + alpha*B mod q
    z_msk = switch_crt_basis_approx(x_B, (msk,)).data[..., 0, :]
    Bprod = 1
    for b in B_mods:
        Bprod *= b
    binv_msk = pow(Bprod % msk, -1, msk)
    # alpha = |(z_msk - x_msk) * B^{-1}|_msk, then centered at msk/2
    msk_q = jnp.asarray(np.array([msk], dtype=np.uint32))[:, None]
    d = sub_mod(z_msk[..., None, :], x_msk[..., None, :], msk_q)
    msk_plan = make_rns_plan(p.N, (msk,))
    binv_m = mont_mul(jnp.asarray(np.array([binv_msk], dtype=np.uint32)
                                  )[:, None],
                      msk_plan.r2[:, None], msk_q,
                      msk_plan.qinv_neg[:, None])
    alpha = mont_mul(d, binv_m, msk_q, msk_plan.qinv_neg[:, None])[
        ..., 0, :]                                       # [..., N]
    q_plan = make_rns_plan(p.N, tuple(q_mods))
    qq = q_plan.q_arr[:, None]
    qinv = q_plan.qinv_neg[:, None]
    B_q = np.array([((Bprod % qj) << 32) % qj for qj in q_mods],
                   dtype=np.uint32)                      # Mont form
    aB = mont_mul(alpha[..., None, :], jnp.asarray(B_q)[:, None], qq, qinv)
    out = sub_mod(z_q.data, aB, qq)
    # centering: alpha >= msk/2 means alpha - msk; add msk*B back
    mskB_q = jnp.asarray(np.array([(msk * Bprod) % qj for qj in q_mods],
                                  dtype=np.uint32))[:, None]
    out = jnp.where((alpha >= u32(msk // 2))[..., None, :],
                    add_mod(out, mskB_q, qq), out)
    return RnsPoly(out, tuple(q_mods), COEFF)


def expand_crt_basis_approx(p: RnsPoly, ext_mods: tuple) -> RnsPoly:
    """ApproxModUp Q -> QP (dcrtpoly-impl.h:988): keep Q limbs, append the
    switched P limbs."""
    ext = switch_crt_basis_approx(p, ext_mods)
    data = jnp.concatenate([p.data, ext.data], axis=-2)
    return RnsPoly(data, p.moduli + tuple(ext_mods), p.fmt)


def approx_mod_down(p: RnsPoly, q_mods: tuple, p_mods: tuple,
                    t: int | None = None) -> RnsPoly:
    """ApproxModDown QP -> Q: out = (x - w) * P^-1 mod Q where w = x mod P
    (basis-switched up to the +v*P slack).

    For BGV (t given) the subtracted term is lifted to a multiple of t:
    w = t * [x_P * t^-1 mod P], so the rounding error stays divisible by
    the plaintext modulus (dcrtpoly ApproxModDown's tInvModq path).

    p: COEFF poly over q_mods + p_mods."""
    assert p.fmt == COEFF and p.moduli == tuple(q_mods) + tuple(p_mods)
    Lq = len(q_mods)
    x_q = RnsPoly(p.data[..., :Lq, :], tuple(q_mods), COEFF)
    x_p = RnsPoly(p.data[..., Lq:, :], tuple(p_mods), COEFF)
    if t is not None:
        tinv = np.array([pow(t % pj, -1, pj) for pj in p_mods],
                        dtype=np.uint32)
        x_p = mul_scalar(x_p, jnp.asarray(tinv))
    sw = switch_crt_basis_approx(x_p, tuple(q_mods))
    if t is not None:
        sw = mul_scalar(sw, t)
    diff = sub(x_q, sw)
    P = 1
    for m in p_mods:
        P *= m
    pinv = np.array([(pow(P % q, -1, q)) for q in q_mods], dtype=np.uint64)
    return mul_scalar(diff, jnp.asarray(pinv.astype(np.uint32)))


@functools.lru_cache(maxsize=None)
def _monomial_eval_table(N: int, moduli: tuple, m: int) -> jax.Array:
    """EVALUATION-format values of X^m over the basis: [L, N] uint32 with
    table[l, k] = psi_l^(m * (2k+1)) mod q_l (the reference's
    MultByMonomialInPlace, used by CKKS bootstrapping's i/-i slot
    rotations)."""
    k = np.arange(N, dtype=np.int64)
    out = np.zeros((len(moduli), N), dtype=np.uint32)
    for l, q in enumerate(moduli):
        psi = nttmod.make_plan(N, q).psi
        # psi has order 2N; exponent m*(2k+1) mod 2N
        e = (m * (2 * k + 1)) % (2 * N)
        pows = np.zeros(2 * N, dtype=np.uint64)
        acc = 1
        for t in range(2 * N):
            pows[t] = acc
            acc = acc * psi % q
        out[l] = pows[e].astype(np.uint32)
    return jnp.asarray(out)


def mul_monomial(p: RnsPoly, m: int) -> RnsPoly:
    """p(X) * X^m in EVALUATION format (negacyclic: X^N = -1)."""
    assert p.fmt == EVAL
    tbl = _monomial_eval_table(p.N, p.moduli, m % (2 * p.N))
    plan = p.plan
    tbl_mont = mont_mul(tbl, plan.r2[:, None], _qb(plan),
                        plan.qinv_neg[:, None])
    out = mont_mul(p.data, tbl_mont, _qb(plan), plan.qinv_neg[:, None])
    return RnsPoly(out, p.moduli, EVAL)


def level_reduce(p: RnsPoly, drop: int) -> RnsPoly:
    """Drop the last `drop` limbs WITHOUT scaling (the reference's
    LevelReduce / DropLastElements, dcrtpoly.h:209 neighborhood): valid for
    ciphertext components because RLWE decryption congruences hold mod any
    prefix product of the chain; message and scale are unchanged."""
    if drop == 0:
        return p
    assert 0 < drop < len(p.moduli)
    return RnsPoly(p.data[..., :-drop, :], p.moduli[:-drop], p.fmt)


def drop_last_element_and_scale(p: RnsPoly, qlinv_mont: jax.Array | None = None
                                ) -> RnsPoly:
    """CKKS rescale (dcrtpoly.h:209 DropLastElementAndScale): with last
    modulus q_L, out_i = (x_i - x_L) * q_L^-1 mod q_i on COEFF data."""
    assert p.fmt == COEFF
    mods = p.moduli
    qL = mods[-1]
    keep = mods[:-1]
    plan_k = make_rns_plan(p.N, keep)
    x_keep = p.data[..., :-1, :]
    x_last = p.data[..., -1:, :]                    # [..., 1, N] values < qL
    qk = plan_k.q_arr[:, None]
    # reduce x_last mod each q_i (x_last < qL < 2^31; q_i < 2^31)
    mu = jnp.asarray(np.array([(1 << 32) // q for q in keep],
                              dtype=np.uint32))[:, None]
    from ..math.modmath import barrett_reduce_u32
    xl = barrett_reduce_u32(jnp.broadcast_to(x_last, x_keep.shape), qk, mu)
    diff = sub_mod(x_keep, xl, qk)
    qlinv = np.array([pow(qL % q, -1, q) for q in keep], dtype=np.uint32)
    out = RnsPoly(diff, keep, COEFF)
    return mul_scalar(out, jnp.asarray(qlinv))


def to_bigint(p: RnsPoly) -> np.ndarray:
    """Host: CRT-reconstruct to exact Python-int coefficients (tests)."""
    data = np.asarray(jax.device_get(p.data))
    mods = p.moduli
    Q = 1
    for q in mods:
        Q *= q
    out = np.zeros(data.shape[:-2] + (data.shape[-1],), dtype=object)
    for i, q in enumerate(mods):
        qhat = Q // q
        c = (pow(qhat % q, -1, q) * qhat) % Q
        out = (out + data[..., i, :].astype(object) * c) % Q
    return out


def from_bigint(vals, moduli: tuple, N: int, fmt: str = COEFF) -> RnsPoly:
    """Host: exact integers -> RNS residues."""
    arr = np.asarray(vals, dtype=object)
    limbs = np.stack([(arr % q).astype(np.uint32) for q in moduli], axis=-2)
    return RnsPoly(jnp.asarray(limbs.astype(np.uint32)), tuple(moduli), fmt)
