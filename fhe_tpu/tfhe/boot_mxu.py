"""Blind-rotate megakernel v2: the whole CGGI scan as ONE Pallas kernel
with the NTTs on the MXU.

Replaces the role of the reference GPU backend's fused batched PBS
(/root/reference/src/core/include/math/hal/mlx/pbs_optimized.h:1-8,
async_pipeline.h:50-95 double-buffered BSK prefetch), re-architected
around the TPU's units:

* NTTs are lane-factored (math/ntt_lane.py): the 128-point DFT factor is
  an int8 digit-plane MXU matmul, the n1 = N/128 factor is log2(n1)
  butterfly stages on the sublane axis -- ~8x fewer MXU MACs than the
  dense [dN, dN] matmul the unfused path uses at N=1024, and ~3x fewer
  VPU ops than all-butterfly stages;
* the layout (EVAL natural / COEFF interleaved) makes every step
  permutation-free -- no bit-reversal, no transposes, and the BSK and
  monomial tables are consumed in their natural order;
* grid = (batch_tiles, n): the accumulator block stays VMEM-resident for
  all n steps of one tile (revisited output block), while the per-step
  BSK slice is double-buffered HBM->VMEM by the Pallas grid pipeline;
* the external product runs as constant-operand Shoup multiplies against
  the Montgomery-form BSK (+ its Shoup dual), and ONE plain-form monomial
  exponentiation chain serves both signs (the negative-index values are
  the lane+sublane flip of the positive ones); the final mont_mul against
  the Montgomery-formed external product cancels the R factor, so results
  are bit-identical to boot.blind_rotate (tested).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..math import ntt as nttmod
from ..math import ntt_lane as nl
from ..math.modmath import (U32, u32, add_mod, sub_mod, shoup_mul,
                            shoup_mul_lazy, mont_mul)
from .params import TfheParams
from . import boot, rgsw


def _ablate() -> frozenset:
    """Trace-time stage-ablation hook for kernel profiling ONLY
    (FHE_MEGA_ABLATE=no_intt,no_decomp,no_fwd,no_ext,no_mono): replaces a
    stage with a cheap shape-preserving stand-in so its cost can be
    differenced out on real hardware.  Never set in production."""
    import os
    v = os.environ.get("FHE_MEGA_ABLATE", "")
    return frozenset(s for s in v.split(",") if s)


@functools.lru_cache(maxsize=None)
def _mono_tables_blocked(N: int, Q: int):
    """Plain monomial exp-by-squaring tables + Shoup duals, reshaped to
    the kernel's [logm, n1, 128] natural-EVAL block layout."""
    with jax.ensure_compile_time_eval():
        tab, dual = boot._mono_sq_tables_plain(N, Q)
        n1 = N // nl.LANES
        logm = tab.shape[0]
        return (jnp.asarray(tab.reshape(logm, n1, nl.LANES)),
                jnp.asarray(dual.reshape(logm, n1, nl.LANES)))


def _roll2(x, s):
    """Rotate axis -2 (sublanes) by s (any sign) inside the kernel."""
    n = x.shape[-2]
    return pltpu.roll(x, s % n, axis=x.ndim - 2)


def _lazy_ok(params: TfheParams) -> bool:
    """Lazy-reduction bounds for the external product + monomial path:
    ep < 2*dG2*Q (plain-add accumulated lazy Shoup products) and
    mono < 2Q must satisfy the REDC bound ep*mono < Q*2^32."""
    return 4 * params.digits_g2 * params.Q < (1 << 32)


def _step_body(acc, bskm, bsks, ip, lp: nl.LanePlan, mono, mono_s, wrev,
               params: TfheParams, zlb: int):
    """One CGGI accumulator update, all in VMEM.

    acc  [Bt, 2, n1, 128] uint32 sublane-BR EVAL, plain form;
    bskm/bsks [2, dG2, 2, n1, 128] Montgomery form + Shoup duals (BR);
    ip   [Bt, 1] uint32 rotation indices (multiples of 2N/q);
    mono/mono_s [logm, n1, 128] plain psi-power tables (BR);
    wrev [df*128, df*128] int8 per-plane lane-reversal matrix (or None).

    Reduction discipline: external products accumulate LAZY Shoup
    values (< 2q each, plain uint32 adds) and the monomial chain carries
    < 2q values; both feed mont_mul, whose REDC tolerates any a*b <
    q*2^32 and emits canonical (< q) results -- bit-identical to the
    fully-reduced pipeline with ~20 fewer VPU ops per step."""
    Q = params.Q
    N = params.N
    n1 = lp.n1
    Bt = acc.shape[0]
    dgt = params.digits_g
    dg2 = params.digits_g2
    bg = params.base_g
    g_bits = bg.bit_length() - 1
    ab = _ablate()
    lazy = _lazy_ok(params)

    # ---- inverse NTT (sublane-BR EVAL -> COEFF interleaved).  With the
    # lazy discipline the carried accumulator lives in [0, 2q) and the
    # DIT stages run 2q-domain butterflies; the recombined COEFF output
    # is canonical (the gadget decompose needs exact values). ----
    if "no_intt" in ab:
        c = acc
    elif lazy:
        c = nl.inverse_lane_br_lazy_in(lp, acc, _roll2)
    else:
        c = nl.inverse_lane_br(lp, acc, _roll2)        # [Bt, 2, n1, 128]

    # ---- parallel balanced digit decompose (digit 0 dropped) ----
    d = c.astype(jnp.int32)
    d = jnp.where(d >= jnp.int32(Q >> 1), d - jnp.int32(Q), d)
    offset = sum((bg >> 1) << (g_bits * t) for t in range(dgt))
    ud = d + jnp.int32(offset)
    digs = [((ud >> (g_bits * t)) & jnp.int32(bg - 1)) - jnp.int32(bg >> 1)
            for t in range(1, dgt)]
    digits = jnp.stack(digs, axis=1)                   # [Bt, dg, 2, n1, 128]
    digits = digits.reshape(Bt, dg2, n1, nl.LANES)

    # ---- forward NTT of digits (MXU signed 2-plane path; lazy variant
    # fuses the twiddle into the recombine and emits values < 2q, which
    # the external product's Shoup multiplies accept verbatim) ----
    if "no_fwd" in ab:
        d_eval = digits.astype(U32) & u32(Q - 1)
    elif lazy:
        lo, hi = nttmod.balanced_base128(digits)
        d_eval = nl.forward_lane_digits_br_lazy(lp, lo, hi, _roll2)
    else:
        lo, hi = nttmod.balanced_base128(digits)
        d_eval = nl.forward_lane_digits_br(lp, lo, hi, _roll2)

    # ---- external products (lazy Shoup, Montgomery-formed results) ----
    def ext(sign):
        # d_eval[:, r:r+1] (lax.slice) -- int+newaxis indexing would
        # lower to a >2D gather, which Mosaic rejects
        if lazy:
            accp = shoup_mul_lazy(d_eval[:, 0:1], bskm[sign, 0],
                                  bsks[sign, 0], Q)
            for r in range(1, dg2):
                accp = accp + shoup_mul_lazy(d_eval[:, r:r + 1],
                                             bskm[sign, r], bsks[sign, r], Q)
            return accp                                # < 2*dG2*Q
        accp = shoup_mul(d_eval[:, 0:1], bskm[sign, 0], bsks[sign, 0], Q)
        for r in range(1, dg2):
            accp = add_mod(
                accp, shoup_mul(d_eval[:, r:r + 1], bskm[sign, r],
                                bsks[sign, r], Q), Q)
        return accp                                    # [Bt, 2, n1, 128]

    if "no_ext" in ab:
        ep_pos = d_eval[:, 0:2]
        ep_neg = d_eval[:, 2:4] if dg2 >= 4 else d_eval[:, 0:2]
    else:
        ep_pos = ext(0)
        ep_neg = ext(1)

    # ---- monomial values.  ONE lazy exp-by-squaring chain computes
    # w = X^idx in EVALUATION; the negative-index values are the flip
    # w_n[k] = w[N-1-k] (psi^{-idx(2k+1)} = psi^{idx(2(N-1-k)+1)}):
    # lane reversal runs as a per-plane int8 MXU matmul (wrev) and the
    # sublane reversal is a static slice-concat -- BR order is flip-
    # invariant (bit-reverse commutes with bitwise complement), so the
    # kernel's sublane-BR layout needs no extra permutation. ----
    def chain(idx):
        w = jnp.full((Bt, n1, nl.LANES), np.uint32(1), dtype=U32)
        for j in range(zlb, mono.shape[0]):
            bit = ((idx >> j) & u32(1))[..., None]     # [Bt, 1, 1]
            wm = (shoup_mul_lazy if lazy else shoup_mul)(
                w, mono[j][None], mono_s[j][None], Q)
            w = jnp.where(bit == 1, wm, w)
        return w

    one = u32(np.uint32(1))
    if "no_mono" in ab:
        mono_p = mono[0][None]
        mono_n = mono[1][None]
    else:
        w_p = chain(ip)
        mono_p = sub_mod(w_p, one, Q)
        if wrev is not None and lazy:
            df = wrev.shape[0] // nl.LANES
            planes = jnp.concatenate(
                [((w_p >> (7 * v)) & u32(127)).astype(jnp.int8)
                 for v in range(df)], axis=-1)         # [Bt, n1, df*128]
            o = jax.lax.dot_general(
                planes.reshape(-1, df * nl.LANES), wrev,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32
            ).reshape(Bt, n1, df * nl.LANES)
            w_n = o[..., 0:nl.LANES].astype(U32)
            for v in range(1, df):
                w_n = w_n + (o[..., v * nl.LANES:(v + 1) * nl.LANES]
                             .astype(U32) << (7 * v))
            # sublane flip (BR-order invariant)
            w_n = jnp.concatenate(
                [w_n[..., n1 - 1 - i:n1 - i, :] for i in range(n1)],
                axis=-2)
            mono_n = sub_mod(w_n, one, Q)
        else:
            ineg = (u32(2 * N) - ip) & u32(2 * N - 1)
            mono_n = sub_mod(chain(ineg), one, Q)

    qinv = u32(nttmod.make_plan(N, Q).qinv_neg)
    m1 = mont_mul(ep_pos, mono_p[:, None], Q, qinv)    # canonical (< q)
    m2 = mont_mul(ep_neg, mono_n[:, None], Q, qinv)
    if lazy:
        # 2q-domain accumulator: acc < 2q, m1 + m2 < 2q (both canonical),
        # so acc + m1 + m2 < 4q needs ONE reduction; the final grid step
        # canonicalizes (see _mega_kernel)
        q2 = u32(np.uint32(2 * Q))
        t = acc + (m1 + m2)
        return jnp.where(t >= q2, t - q2, t)
    upd = add_mod(m1, m2, Q)
    return add_mod(acc, upd, Q)


_LP_FIELDS = ("W128f_s2", "W128i", "tw_f", "tw_f_s", "tw_f14", "tw_f14_s",
              "tw_i", "tw_i_s", "st2_f", "st2_f_s", "st2_i", "st2_i_s",
              "comb14")


def _mega_kernel(acc0_ref, bskm_ref, bsks_ref, ip_ref,
                 mono_ref, monos_ref, wrev_ref, *rest, params: TfheParams,
                 lp_static: nl.LanePlan, zlb: int):
    import dataclasses
    lp_refs, out_ref = rest[:-1], rest[-1]
    lp = dataclasses.replace(
        lp_static, **{f: r[:] for f, r in zip(_LP_FIELDS, lp_refs)})
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = acc0_ref[:]

    out = _step_body(out_ref[:], bskm_ref[0], bsks_ref[0],
                     ip_ref[0, 0], lp, mono_ref[:], monos_ref[:],
                     wrev_ref[:] if wrev_ref is not None else None,
                     params, zlb)
    if _lazy_ok(params):
        # canonicalize the 2q-domain accumulator on the LAST step only
        q = jnp.uint32(params.Q)
        last = j == pl.num_programs(1) - 1
        out = jnp.where(last & (out >= q), out - q, out)
    out_ref[:] = out


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.lru_cache(maxsize=None)
def _rev_matrix(df: int) -> jax.Array:
    """Per-plane lane-reversal int8 matrix [df*128, df*128]: block v is
    the 128x128 anti-identity, so the digit planes of a uint32 lane
    vector are each reversed by ONE MXU matmul (Mosaic rejects lax.rev's
    gather; a 0/1 matmul is the TPU-native permutation)."""
    with jax.ensure_compile_time_eval():
        L = nl.LANES
        J = np.zeros((df * L, df * L), dtype=np.int8)
        for v in range(df):
            for i in range(L):
                J[v * L + i, v * L + (L - 1 - i)] = 1
        return jnp.asarray(J)


@functools.lru_cache(maxsize=None)
def _mega_call(params: TfheParams, Bt: int, n: int, zlb: int):
    N = params.N
    dg2 = params.digits_g2
    lp = nl.make_lane_plan(N, params.Q)
    n1 = lp.n1
    L = nl.LANES
    logm = (2 * N).bit_length() - 1
    kern = functools.partial(_mega_kernel, params=params, lp_static=lp,
                             zlb=zlb)
    ms = pltpu.ANY if _interpret() else pltpu.VMEM
    lp_arrays = tuple(getattr(lp, f) for f in _LP_FIELDS)
    df = -(-(2 * params.Q - 1).bit_length() // 7)
    wrev = _rev_matrix(df)

    def full_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i, j, _n=nd: (0,) * _n,
                            memory_space=ms)

    def call(acc, bskm, bsks, ip, mono, mono_s):
        B = acc.shape[0]
        grid = (B // Bt, n)
        specs = [
            pl.BlockSpec((Bt, 2, n1, L), lambda i, j: (i, 0, 0, 0),
                         memory_space=ms),
            pl.BlockSpec((1, 2, dg2, 2, n1, L),
                         lambda i, j: (j, 0, 0, 0, 0, 0), memory_space=ms),
            pl.BlockSpec((1, 2, dg2, 2, n1, L),
                         lambda i, j: (j, 0, 0, 0, 0, 0), memory_space=ms),
            pl.BlockSpec((1, 1, Bt, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=ms),
            pl.BlockSpec((logm, n1, L), lambda i, j: (0, 0, 0),
                         memory_space=ms),
            pl.BlockSpec((logm, n1, L), lambda i, j: (0, 0, 0),
                         memory_space=ms),
            full_spec(wrev),
        ] + [full_spec(t) for t in lp_arrays]
        params_c = None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=specs,
            out_specs=pl.BlockSpec((Bt, 2, n1, L), lambda i, j: (i, 0, 0, 0),
                                   memory_space=ms),
            out_shape=jax.ShapeDtypeStruct((B, 2, n1, L), jnp.uint32),
            compiler_params=params_c,
            interpret=_interpret(),
        )(acc, bskm, bsks, ip, mono, mono_s, wrev, *lp_arrays)
    return call


def blind_rotate_mega2(params: TfheParams, bsk: jax.Array,
                       bsk_shoup: jax.Array, acc: jax.Array, a: jax.Array,
                       tile: int | None = None,
                       a_modulus: int | None = None) -> jax.Array:
    """Whole-scan fused CGGI accumulation (megakernel v2).

    bsk/bsk_shoup: [n, 2, dG2, 2, N] natural-EVAL Montgomery (+ duals);
    acc: [B, 2, N] natural-EVAL plain; a: [B, n] LWE mask mod q.
    Returns the final accumulator [B, 2, N], natural EVAL -- bit-exact vs
    boot.blind_rotate."""
    import os
    N = params.N
    q = params.q if a_modulus is None else a_modulus
    n = bsk.shape[0]
    n1 = N // nl.LANES
    m_by = (2 * N) // q
    zlb = (m_by.bit_length() - 1) if (m_by & (m_by - 1)) == 0 else 0
    idx_pos = (jnp.where(a == 0, 0, u32(q) - a) * u32(m_by)) & u32(2 * N - 1)
    B = acc.shape[0]
    # swept on v5e at STD128 b2048 (lazy-reduction kernel):
    # 4950/5085 gates/s at 256/512 -- 512 wins ~3% for ~3x compile time,
    # the right trade for a served key (compile once, run for hours)
    tile = tile if tile is not None else int(
        os.environ.get("FHE_MEGA_TILE", "512"))
    Bt = min(tile, -(-B // 8) * 8)
    Bp = -(-B // Bt) * Bt
    if Bp != B:
        acc = jnp.pad(acc, ((0, Bp - B), (0, 0), (0, 0)))
        idx_pos = jnp.pad(idx_pos, ((0, Bp - B), (0, 0)))
    TI = Bp // Bt
    ip4 = idx_pos.reshape(TI, Bt, n).transpose(0, 2, 1)[..., None]
    mono, mono_s = _mono_tables_blocked(N, params.Q)
    call = _mega_call(params, Bt, n, zlb)
    # the kernel's EVAL order is sublane-BR (the DIF/DIT butterflies are
    # permutation-free in that order); permute all EVAL-side operands
    # once at the boundary
    br = jnp.asarray(nl.br_perm(n1))
    tobr = lambda x: jnp.take(x, br, axis=-2)
    acc_b = tobr(acc.reshape(Bp, 2, n1, nl.LANES))
    bskm = tobr(bsk.reshape(n, 2, params.digits_g2, 2, n1, nl.LANES))
    bsks = tobr(bsk_shoup.reshape(n, 2, params.digits_g2, 2, n1, nl.LANES))
    out = call(acc_b, bskm, bsks, ip4, tobr(mono), tobr(mono_s))
    return tobr(out).reshape(Bp, 2, N)[:B]


def bootstrap_core_mega2(params: TfheParams, key: rgsw.BootstrapKey,
                         test_vec: jax.Array, a: jax.Array,
                         mxu: "nttmod.MxuTables | None" = None) -> jax.Array:
    """Drop-in for boot.bootstrap_core with impl='mega2': natural-order
    EVAL in and out, no key or table permutations."""
    assert key.bsk_shoup is not None
    plan = nttmod.make_plan(params.N, params.Q)
    B = test_vec.shape[0]
    impl = "mxu" if mxu is not None else "butterfly"
    acc1 = nttmod.ntt_forward(plan, test_vec, impl, mxu)[:, None, :]
    acc0 = jnp.zeros((B, 1, params.N), dtype=U32)
    acc = jnp.concatenate([acc0, acc1], axis=1)
    return blind_rotate_mega2(params, key.bsk, key.bsk_shoup, acc, a)
