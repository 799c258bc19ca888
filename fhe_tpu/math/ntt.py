"""Negacyclic NTT over 32-bit prime fields, TPU-native.

Semantics match the reference CPU transform (negacyclic convolution over
Z_q[X]/(X^N+1); reference: src/core/include/math/hal/intnat/
transformnat-impl.h:302-374 forward, :515+ inverse), re-architected for TPU:

EVALUATION layout (canonical, natural order):
    eval[k] = a(psi^(2k+1)),  k = 0..N-1,  psi a primitive 2N-th root.

Two execution paths produce identical uint32 results:

1. `forward_butterfly` / `inverse_butterfly` -- vectorized Cooley-Tukey /
   Gentleman-Sande stages with Shoup twiddles, log2(N) static reshape stages.
   Runs on any XLA backend; the correctness anchor.

2. `forward_mxu` / `inverse_mxu` -- the NTT as ONE int8 matmul on the MXU.
   The transform matrix W[i,k] = psi^(i(2k+1)) is digit-decomposed into
   7-bit planes and stacked into a [Din*N, Dout*N] int8 block matrix whose
   (u,v) block is digit7_v(2^(7u) * W mod q); the input is decomposed into
   Din 7-bit planes [B, Din*N].  A single [B, Din*N] x [Din*N, Dout*N]
   int8->int32 matmul computes all digit cross terms exactly (contraction
   bound Din*N*127^2 < 2^31), followed by a cheap VPU recombination
   sum_v (plane_v mod q) * (2^(7v) mod q).  This replaces the reference
   GPU backend's fused threadgroup NTT (metal_dispatch_optimized.h:190)
   with the operation TPUs are built for: a large dense matmul.

Signed small inputs (gadget-decomposed digits of TFHE external products)
use a narrower balanced-base-128 plane stack, halving the matmul width.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from . import primes
from .modmath import (U32, I32, add_mod, sub_mod, mont_mul, mont_constants,
                      shoup_precompute, shoup_mul, reduce_i32, u32)


def bit_reverse_perm(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    perm = np.zeros(n, dtype=np.int32)
    for i in range(n):
        r = 0
        x = i
        for _ in range(logn):
            r = (r << 1) | (x & 1)
            x >>= 1
        perm[i] = r
    return perm


def _digits7_unsigned(w: int, planes: int) -> list[int]:
    return [(w >> (7 * v)) & 127 for v in range(planes)]


def _build_digit_matrix(W: np.ndarray, q: int, d_in: int, d_out: int,
                        in_weights: list[int]) -> np.ndarray:
    """Stack digit planes of (in_weights[u] * W mod q) into int8 blocks.

    W: [R, C] uint64-safe numpy of values < q.
    Returns int8 [d_in*R, d_out*C]; block (u, v) = digit7_v(w_u * W mod q).
    """
    R, C = W.shape
    out = np.zeros((d_in * R, d_out * C), dtype=np.int8)
    W64 = W.astype(np.uint64)
    for u in range(d_in):
        scaled = (W64 * np.uint64(in_weights[u] % q)) % np.uint64(q)
        for v in range(d_out):
            dig = (scaled >> np.uint64(7 * v)) & np.uint64(127)
            out[u * R:(u + 1) * R, v * C:(v + 1) * C] = dig.astype(np.int8)
    return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NttPlan:
    """Per-(N, q) precomputed tables.  Arrays are device-placeable pytree
    leaves; N/q and derived Python ints are static metadata.

    The plan holds only the O(N) butterfly tables; the O(N^2) dense MXU
    matrices live in MxuTables (make_mxu), built lazily and passed as jit
    ARGUMENTS (never closed over) so they are not baked into jaxprs as
    multi-MB constants."""

    # static
    N: int = dataclasses.field(metadata=dict(static=True))
    q: int = dataclasses.field(metadata=dict(static=True))
    logN: int = dataclasses.field(metadata=dict(static=True))
    d_full: int = dataclasses.field(metadata=dict(static=True))   # planes for [0,q) input
    d_out: int = dataclasses.field(metadata=dict(static=True))    # planes of W entries
    qinv_neg: int = dataclasses.field(metadata=dict(static=True))
    r2: int = dataclasses.field(metadata=dict(static=True))       # 2^64 mod q
    psi: int = dataclasses.field(metadata=dict(static=True))
    # butterfly tables
    fwd_w: jax.Array      # [N] psi^br(j), uint32
    fwd_ws: jax.Array     # shoup companions
    inv_w: jax.Array      # [N] psi^-br(j)
    inv_ws: jax.Array
    ninv: jax.Array       # scalar N^-1 mod q
    ninv_s: jax.Array
    br: jax.Array         # [N] int32 bit reversal permutation (involution)
    # recombination weights 2^(7v) mod q, with shoup companions: [d_out]
    comb_w: jax.Array
    comb_ws: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MxuTables:
    """Dense int8 digit-plane DFT matrices for the MXU path (O(d^2 N^2)
    bytes -- used for the TFHE ring sizes N <= 4096; larger PKE rings use
    the butterfly path / four-step decomposition)."""
    Wf: jax.Array         # [d_full*N, d_out*N] forward
    Wi: jax.Array         # [d_full*N, d_out*N] inverse (N^-1 folded)
    Wf_s2: jax.Array      # [2*N, d_out*N] forward, balanced base-128 signed


@functools.lru_cache(maxsize=None)
def make_mxu(N: int, q: int) -> MxuTables:
    """Lazy dense MXU matrices for (N, q)."""
    with jax.ensure_compile_time_eval():
        return _make_mxu(N, q)


def _make_mxu(N: int, q: int) -> MxuTables:
    plan = make_plan(N, q)
    psi, d_full, d_out = plan.psi, plan.d_full, plan.d_out
    ninv = pow(N, -1, q)
    psi_inv = pow(psi, -1, q)
    i_idx = np.arange(N, dtype=np.int64)
    psi_pows = np.zeros(2 * N, dtype=np.uint64)
    acc = 1
    for e in range(2 * N):
        psi_pows[e] = acc
        acc = acc * psi % q
    expo_f = (np.outer(i_idx, 2 * i_idx + 1)) % (2 * N)
    Wf_full = psi_pows[expo_f]
    psi_inv_pows = np.zeros(2 * N, dtype=np.uint64)
    acc = 1
    for e in range(2 * N):
        psi_inv_pows[e] = acc
        acc = acc * psi_inv % q
    expo_i = (np.outer(2 * i_idx + 1, i_idx)) % (2 * N)
    Wi_full = (psi_inv_pows[expo_i] * np.uint64(ninv)) % np.uint64(q)
    in_w_full = [1 << (7 * u) for u in range(d_full)]
    Wf = _build_digit_matrix(Wf_full, q, d_full, d_out, in_w_full)
    Wi = _build_digit_matrix(Wi_full, q, d_full, d_out, in_w_full)
    Wf_s2 = _build_digit_matrix(Wf_full, q, 2, d_out, [1, 128])
    return MxuTables(Wf=jnp.asarray(Wf), Wi=jnp.asarray(Wi),
                     Wf_s2=jnp.asarray(Wf_s2))


@functools.lru_cache(maxsize=None)
def make_plan(N: int, q: int) -> NttPlan:
    with jax.ensure_compile_time_eval():
        return _make_plan(N, q)


def _make_plan(N: int, q: int) -> NttPlan:
    assert N & (N - 1) == 0 and N >= 8
    assert q % (2 * N) == 1 and primes.is_prime(q) and q < 2**31
    logN = N.bit_length() - 1
    psi = primes.root_of_unity(2 * N, q)
    psi_inv = pow(psi, -1, q)
    ninv = pow(N, -1, q)
    qinv_neg, _r1, r2 = mont_constants(q)

    br = bit_reverse_perm(N)
    fwd_w = np.array([pow(psi, int(br[j]), q) for j in range(N)], dtype=np.uint32)
    inv_w = np.array([pow(psi_inv, int(br[j]), q) for j in range(N)], dtype=np.uint32)
    fwd_ws = np.array([shoup_precompute(int(w), q) for w in fwd_w], dtype=np.uint32)
    inv_ws = np.array([shoup_precompute(int(w), q) for w in inv_w], dtype=np.uint32)

    d_full = max(1, -(-q.bit_length() // 7))
    d_out = d_full

    comb_w = np.array([(1 << (7 * v)) % q for v in range(d_out)], dtype=np.uint32)
    comb_ws = np.array([shoup_precompute(int(w), q) for w in comb_w],
                       dtype=np.uint32)

    return NttPlan(
        N=N, q=q, logN=logN, d_full=d_full, d_out=d_out,
        qinv_neg=int(qinv_neg), r2=int(r2), psi=psi,
        fwd_w=jnp.asarray(fwd_w), fwd_ws=jnp.asarray(fwd_ws),
        inv_w=jnp.asarray(inv_w), inv_ws=jnp.asarray(inv_ws),
        ninv=jnp.asarray(np.uint32(ninv)),
        ninv_s=jnp.asarray(np.uint32(shoup_precompute(ninv, q))),
        br=jnp.asarray(br),
        comb_w=jnp.asarray(comb_w), comb_ws=jnp.asarray(comb_ws),
    )


# ---------------------------------------------------------------------------
# Butterfly path (any backend)
# ---------------------------------------------------------------------------

def forward_butterfly(plan: NttPlan, x: jax.Array) -> jax.Array:
    """[..., N] uint32 COEFFICIENT -> EVALUATION (natural order)."""
    N, q = plan.N, plan.q
    lead = x.shape[:-1]
    x = x.reshape(-1, N)
    for s in range(plan.logN):
        m = 1 << s
        t = N >> (s + 1)
        xv = x.reshape(-1, m, 2, t)
        tw = jax.lax.dynamic_slice_in_dim(plan.fwd_w, m, m).reshape(1, m, 1)
        tws = jax.lax.dynamic_slice_in_dim(plan.fwd_ws, m, m).reshape(1, m, 1)
        u = xv[:, :, 0, :]
        v = shoup_mul(xv[:, :, 1, :], tw, tws, q)
        x = jnp.stack([add_mod(u, v, q), sub_mod(u, v, q)], axis=2).reshape(-1, N)
    # output is in bit-reversed order; permute to natural
    x = jnp.take(x, plan.br, axis=-1)
    return x.reshape(*lead, N)


def inverse_butterfly(plan: NttPlan, x: jax.Array) -> jax.Array:
    """[..., N] uint32 EVALUATION (natural order) -> COEFFICIENT."""
    N, q = plan.N, plan.q
    lead = x.shape[:-1]
    x = x.reshape(-1, N)
    x = jnp.take(x, plan.br, axis=-1)   # natural -> bit-reversed (involution)
    for s in range(plan.logN):
        h = N >> (s + 1)
        t = 1 << s
        xv = x.reshape(-1, h, 2, t)
        tw = jax.lax.dynamic_slice_in_dim(plan.inv_w, h, h).reshape(1, h, 1)
        tws = jax.lax.dynamic_slice_in_dim(plan.inv_ws, h, h).reshape(1, h, 1)
        u = xv[:, :, 0, :]
        v = xv[:, :, 1, :]
        lo = add_mod(u, v, q)
        hi = shoup_mul(sub_mod(u, v, q), tw, tws, q)
        x = jnp.stack([lo, hi], axis=2).reshape(-1, N)
    x = shoup_mul(x, plan.ninv, plan.ninv_s, q)
    return x.reshape(*lead, N)


# ---------------------------------------------------------------------------
# MXU matmul path
# ---------------------------------------------------------------------------

def _decompose_u32_planes(x: jax.Array, d: int) -> jax.Array:
    """[..., N] uint32 in [0, q) -> [..., d, N] int8 of 7-bit digits
    (stacked on a NEW axis -- no lane-axis concat relayout)."""
    planes = [((x >> (7 * u)) & jnp.uint32(127)).astype(jnp.int8)
              for u in range(d)]
    return jnp.stack(planes, axis=-2)


def _matmul_recombine(plan: NttPlan, planes_i8: jax.Array, W: jax.Array) -> jax.Array:
    """[B, Din, N] int8  x  [Din*N, Dout*N] int8  ->  [B, N] uint32 mod q.

    The digit and coefficient axes contract together in ONE dot_general
    (no [B, Din*N] flattening relayout on the data side)."""
    q = plan.q
    Wr = W.reshape(W.shape[0] // plan.N, plan.N, -1)   # [Din, N, Dout*N]
    acc = jax.lax.dot_general(
        planes_i8, Wr,
        dimension_numbers=(((planes_i8.ndim - 2, planes_i8.ndim - 1),
                            (0, 1)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.reshape(*acc.shape[:-1], plan.d_out, plan.N)
    res = reduce_i32(out[..., 0, :], q)
    for v in range(1, plan.d_out):
        term = shoup_mul(reduce_i32(out[..., v, :], q),
                         plan.comb_w[v], plan.comb_ws[v], q)
        res = add_mod(res, term, q)
    return res


def forward_mxu(plan: NttPlan, x: jax.Array,
                mxu: MxuTables | None = None) -> jax.Array:
    """[..., N] uint32 COEFFICIENT -> EVALUATION via one int8 MXU matmul."""
    mxu = mxu if mxu is not None else make_mxu(plan.N, plan.q)
    lead = x.shape[:-1]
    planes = _decompose_u32_planes(x.reshape(-1, plan.N), plan.d_full)
    return _matmul_recombine(plan, planes, mxu.Wf).reshape(*lead, plan.N)


def inverse_mxu(plan: NttPlan, x: jax.Array,
                mxu: MxuTables | None = None) -> jax.Array:
    """[..., N] uint32 EVALUATION -> COEFFICIENT via one int8 MXU matmul."""
    mxu = mxu if mxu is not None else make_mxu(plan.N, plan.q)
    lead = x.shape[:-1]
    planes = _decompose_u32_planes(x.reshape(-1, plan.N), plan.d_full)
    return _matmul_recombine(plan, planes, mxu.Wi).reshape(*lead, plan.N)


def forward_mxu_signed2(plan: NttPlan, lo_i8: jax.Array, hi_i8: jax.Array,
                        mxu: MxuTables | None = None) -> jax.Array:
    """Forward NTT of small signed inputs x = lo + 128*hi (|x| <= ~2^13).

    lo/hi: [..., N] int8 balanced base-128 planes (from gadget decomposition).
    Half-width matmul against Wf_s2.
    """
    mxu = mxu if mxu is not None else make_mxu(plan.N, plan.q)
    lead = lo_i8.shape[:-1]
    planes = jnp.stack([lo_i8.reshape(-1, plan.N),
                        hi_i8.reshape(-1, plan.N)], axis=-2)
    return _matmul_recombine(plan, planes, mxu.Wf_s2).reshape(*lead, plan.N)


def balanced_base128(x_i32: jax.Array):
    """Signed int32 |x| <= 2^13 -> (lo, hi) int8 with x = lo + 128*hi,
    lo in [-64, 64)."""
    lo = ((x_i32 + 64) & 127) - 64
    hi = (x_i32 - lo) >> 7
    return lo.astype(jnp.int8), hi.astype(jnp.int8)


# ---------------------------------------------------------------------------
# Dispatch + ring helpers
# ---------------------------------------------------------------------------

def _use_mxu() -> bool:
    return jax.default_backend() == "tpu"


FOURSTEP_MIN_N = 4096    # dense MXU matrices infeasible at/above this
#                          ([d*N, d*N] int8 = 420 MB at N=4096, 30-bit q)


def _lane_ok(N: int, q: int) -> bool:
    """The lane-factored NTT (ntt_lane) applies when N = n1*128 with n1 a
    power of two and q < 2^31 (int8 digit planes)."""
    n1 = N // 128
    return N % 128 == 0 and n1 >= 2 and (n1 & (n1 - 1)) == 0 and q < (1 << 31)


def _auto_impl(N: int, q: int = 0) -> str:
    if not _use_mxu():
        return "butterfly"
    if N >= FOURSTEP_MIN_N:
        # the lane factorization costs ~n2/d x fewer MXU MACs than the
        # dense path and keeps all butterflies on the 8x128 sublane axis;
        # measured faster than the generic four-step at every N >= 4096
        return "lane" if (q and _lane_ok(N, q)) else "fourstep"
    return "mxu"


def forward_lane_natural(plan: NttPlan, x: jax.Array) -> jax.Array:
    """Lane-factored forward NTT on natural [..., N] layouts (shims the
    interleaved COEFF / blocked EVAL orders at the boundary)."""
    from . import ntt_lane as nl
    lp = nl.make_lane_plan(plan.N, plan.q)
    return nl.blocked_to_eval(nl.forward_lane(
        lp, nl.coeff_to_interleaved(x, lp.n1)))


def inverse_lane_natural(plan: NttPlan, x: jax.Array) -> jax.Array:
    from . import ntt_lane as nl
    lp = nl.make_lane_plan(plan.N, plan.q)
    return nl.interleaved_to_coeff(nl.inverse_lane(
        lp, nl.eval_to_blocked(x, lp.n1)))


def ntt_forward(plan: NttPlan, x: jax.Array, impl: Optional[str] = None,
                mxu: MxuTables | None = None) -> jax.Array:
    impl = impl or _auto_impl(plan.N, plan.q)
    if impl == "mxu" and plan.N >= FOURSTEP_MIN_N:
        impl = "fourstep"
    if impl == "lane" and not _lane_ok(plan.N, plan.q):
        impl = "fourstep" if plan.N >= FOURSTEP_MIN_N else "butterfly"
    if impl == "mxu":
        return forward_mxu(plan, x, mxu)
    if impl == "lane":
        return forward_lane_natural(plan, x)
    if impl == "fourstep":
        from . import ntt_fourstep
        return ntt_fourstep.forward_fourstep(plan, x)
    if impl == "pallas":
        from . import ntt_pallas
        return ntt_pallas.forward_pallas(plan, x)
    return forward_butterfly(plan, x)


def ntt_inverse(plan: NttPlan, x: jax.Array, impl: Optional[str] = None,
                mxu: MxuTables | None = None) -> jax.Array:
    impl = impl or _auto_impl(plan.N, plan.q)
    if impl == "mxu" and plan.N >= FOURSTEP_MIN_N:
        impl = "fourstep"
    if impl == "lane" and not _lane_ok(plan.N, plan.q):
        impl = "fourstep" if plan.N >= FOURSTEP_MIN_N else "butterfly"
    if impl == "mxu":
        return inverse_mxu(plan, x, mxu)
    if impl == "lane":
        return inverse_lane_natural(plan, x)
    if impl == "fourstep":
        from . import ntt_fourstep
        return ntt_fourstep.inverse_fourstep(plan, x)
    if impl == "pallas":
        from . import ntt_pallas
        return ntt_pallas.inverse_pallas(plan, x)
    return inverse_butterfly(plan, x)


def to_mont(plan: NttPlan, x: jax.Array) -> jax.Array:
    return mont_mul(x, u32(plan.r2), plan.q, u32(plan.qinv_neg))


def pointwise_mont(plan: NttPlan, a: jax.Array, b_mont: jax.Array) -> jax.Array:
    """a * b mod q where b_mont is in Montgomery form; result plain form."""
    return mont_mul(a, b_mont, plan.q, u32(plan.qinv_neg))


def pointwise_mul(plan: NttPlan, a: jax.Array, b: jax.Array) -> jax.Array:
    """Plain a * b mod q (two REDCs)."""
    return pointwise_mont(plan, to_mont(plan, a), b)


def negacyclic_mul(plan: NttPlan, a: jax.Array, b: jax.Array,
                   impl: Optional[str] = None) -> jax.Array:
    """Negacyclic polynomial product in COEFFICIENT domain (for tests)."""
    ea = ntt_forward(plan, a, impl)
    eb = ntt_forward(plan, b, impl)
    return ntt_inverse(plan, pointwise_mul(plan, ea, eb), impl)
