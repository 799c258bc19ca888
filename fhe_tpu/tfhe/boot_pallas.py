"""Fused blind-rotate step: the whole CGGI accumulator update as ONE
Pallas kernel.

The role of the reference GPU backend's fused PBS pipeline
(/root/reference/src/core/include/math/hal/mlx/pbs_optimized.h:1-8 and
external_product_fused.h -- "everything on GPU, zero roundtrips"),
re-architected for TPU:

* per scan step, a single `pallas_call` runs inverse NTT -> signed digit
  decompose -> forward NTT of the digits -> two external products ->
  monomial (X^idx - 1) multiplies -> accumulator add, with every
  intermediate resident in VMEM (the unfused pipeline materializes ~15
  HBM tensors per step);
* ALL data stays in bit-reversed evaluation order across the scan: the
  inverse butterfly natively consumes BR and the forward butterfly
  natively produces BR, so keeping the bootstrap key and monomial tables
  BR-permuted removes every permutation from the hot loop (one gather
  converts the accumulator back to natural order before extraction);
* monomials are evaluated by exponentiation-by-squaring over log2(2N)
  constant tables (see boot.monomial_minus_one_eval).

Bit-exact against the unfused boot.blind_rotate pipeline."""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..math import ntt as nttmod
from ..math import ntt_pallas as ntp
from ..math.modmath import (U32, u32, add_mod, sub_mod, shoup_mul,
                            mont_mul)
from .params import TfheParams
from . import boot, rgsw, lwe


@functools.lru_cache(maxsize=None)
def _fused_tables(N: int, q: int, qinv_neg: int):
    """Host tables for the fused kernel: butterfly stage twiddles
    (ntt_pallas) + BR-permuted monomial exp-by-squaring tables + scalars."""
    with jax.ensure_compile_time_eval():
        return _fused_tables_impl(N, q)


def _fused_tables_impl(N, q):
    f_tw, f_tws, g_tw, g_tws = ntp._stage_tables(N, q)
    plan = nttmod.make_plan(N, q)
    br = np.asarray(plan.br)
    mono = boot._mono_sq_tables(N, q)[:, br]     # [logm, N] BR order
    ninv = np.array([[int(np.asarray(plan.ninv)),
                      int(np.asarray(plan.ninv_s)),
                      (1 << 32) % q, 0]], dtype=np.uint32)
    return (jnp.asarray(f_tw), jnp.asarray(f_tws), jnp.asarray(g_tw),
            jnp.asarray(g_tws), jnp.asarray(mono), jnp.asarray(ninv))


def bsk_to_br(params: TfheParams, bsk: jax.Array) -> jax.Array:
    """One-time conversion of the bootstrap key's evaluation axis to
    bit-reversed order."""
    plan = nttmod.make_plan(params.N, params.Q)
    return jnp.take(bsk, jnp.asarray(np.asarray(plan.br)), axis=-1)


def _step_body(acc, bsk, ip, ineg, gtw_ref, gtws_ref, ftw_ref, ftws_ref,
               mono_ref, ninv_ref, params: TfheParams):
    """One CGGI accumulator update on VMEM-resident values.
    acc [Bt, 2, N] BR eval; bsk indexable [sign, row] -> [2, N];
    ip/ineg [Bt, 1].  Returns the updated accumulator."""
    N, Q = params.N, params.Q
    logN = N.bit_length() - 1
    qinv = u32(nttmod.make_plan(N, Q).qinv_neg)
    Bt = acc.shape[0]
    dgt = params.digits_g
    dg2 = params.digits_g2
    bg = params.base_g
    g_bits = bg.bit_length() - 1

    pos2 = jax.lax.broadcasted_iota(jnp.uint32, (Bt * 2, N), 1)

    # ---- inverse NTT (consumes BR, produces natural COEFF) ----
    x = acc.reshape(Bt * 2, N)
    for s in range(logN):
        t = 1 << s
        lo_m = ((pos2 // u32(t)) & u32(1)) == 0
        partner = jnp.where(lo_m, pltpu.roll(x, (-t) % N, axis=1),
                            pltpu.roll(x, t % N, axis=1))
        tw = gtw_ref[s, :][None, :]
        tws = gtws_ref[s, :][None, :]
        x = jnp.where(lo_m, add_mod(x, partner, Q),
                      shoup_mul(sub_mod(partner, x, Q), tw, tws, Q))
    x = shoup_mul(x, ninv_ref[0, 0], ninv_ref[0, 1], Q)
    c = x.reshape(Bt, 2, N)

    # ---- parallel balanced digit decompose (digit 0 dropped) ----
    d = c.astype(jnp.int32)
    d = jnp.where(d >= jnp.int32(Q >> 1), d - jnp.int32(Q), d)
    offset = sum((bg >> 1) << (g_bits * t) for t in range(dgt))
    ud = d + jnp.int32(offset)
    digs = [((ud >> (g_bits * t)) & jnp.int32(bg - 1)) - jnp.int32(bg >> 1)
            for t in range(1, dgt)]
    digits = jnp.stack(digs, axis=-3)                 # [Bt, dg, 2, N]
    digits = digits.reshape(Bt, dg2, N)

    # ---- forward NTT of digits (natural COEFF -> BR eval) ----
    y = jnp.where(digits < 0, digits + jnp.int32(Q), digits
                  ).astype(U32).reshape(Bt * dg2, N)
    posd = jax.lax.broadcasted_iota(jnp.uint32, (Bt * dg2, N), 1)
    for s in range(logN):
        t = N >> (s + 1)
        lo_m = ((posd // u32(t)) & u32(1)) == 0
        partner = jnp.where(lo_m, pltpu.roll(y, (-t) % N, axis=1),
                            pltpu.roll(y, t % N, axis=1))
        tw = ftw_ref[s, :][None, :]
        tws = ftws_ref[s, :][None, :]
        v = jnp.where(lo_m, partner, y)
        wv = shoup_mul(v, tw, tws, Q)
        y = jnp.where(lo_m, add_mod(y, wv, Q), sub_mod(partner, wv, Q))
    d_eval = y.reshape(Bt, dg2, N)

    # ---- external products (both signs) + monomial + update ----
    def ext(sign):
        accp = mont_mul(d_eval[:, 0, :][:, None, :],
                        bsk[sign, 0], Q, qinv)        # [Bt, 2, N]
        for r in range(1, dg2):
            accp = add_mod(accp, mont_mul(d_eval[:, r, :][:, None, :],
                                          bsk[sign, r], Q, qinv), Q)
        return accp

    ep_pos = ext(0)
    ep_neg = ext(1)

    def mono(idx):                                    # [Bt, 1] -> [Bt, N]
        r1 = ninv_ref[0, 2]
        w = jnp.full((Bt, N), r1, dtype=U32)
        for j in range((2 * N).bit_length() - 1):
            bit = (idx >> j) & u32(1)                 # [Bt, 1]
            wm = mont_mul(w, mono_ref[j, :][None, :], Q, qinv)
            w = jnp.where(bit == 1, wm, w)
        return sub_mod(w, r1, Q)

    mono_p = mono(ip)[:, None, :]
    mono_n = mono(ineg)[:, None, :]
    upd = add_mod(mont_mul(ep_pos, mono_p, Q, qinv),
                  mont_mul(ep_neg, mono_n, Q, qinv), Q)
    return add_mod(acc, upd, Q)


def _step_kernel(acc_ref, bsk_ref, ip_ref, ineg_ref,
                 gtw_ref, gtws_ref, ftw_ref, ftws_ref, mono_ref,
                 ninv_ref, out_ref, *, params: TfheParams):
    out_ref[:] = _step_body(acc_ref[:], bsk_ref, ip_ref[:], ineg_ref[:],
                            gtw_ref, gtws_ref, ftw_ref, ftws_ref,
                            mono_ref, ninv_ref, params)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.lru_cache(maxsize=None)
def _step_call(params: TfheParams, Bt: int):
    N = params.N
    dg2 = params.digits_g2
    logm = (2 * N).bit_length() - 1
    logN = N.bit_length() - 1
    kern = functools.partial(_step_kernel, params=params)
    ms = pltpu.ANY if _interpret() else pltpu.VMEM

    def call(acc, bsk_i, ip, ineg, tabs):
        f_tw, f_tws, g_tw, g_tws, mono, ninv = tabs
        B = acc.shape[0]
        grid = (B // Bt,)
        specs = [
            pl.BlockSpec((Bt, 2, N), lambda i: (i, 0, 0), memory_space=ms),
            pl.BlockSpec((2, dg2, 2, N), lambda i: (0, 0, 0, 0),
                         memory_space=ms),
            pl.BlockSpec((Bt, 1), lambda i: (i, 0), memory_space=ms),
            pl.BlockSpec((Bt, 1), lambda i: (i, 0), memory_space=ms),
            pl.BlockSpec((logN, N), lambda i: (0, 0), memory_space=ms),
            pl.BlockSpec((logN, N), lambda i: (0, 0), memory_space=ms),
            pl.BlockSpec((logN, N), lambda i: (0, 0), memory_space=ms),
            pl.BlockSpec((logN, N), lambda i: (0, 0), memory_space=ms),
            pl.BlockSpec((logm, N), lambda i: (0, 0), memory_space=ms),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=ms),
        ]
        params_c = None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=specs,
            out_specs=pl.BlockSpec((Bt, 2, N), lambda i: (i, 0, 0),
                                   memory_space=ms),
            out_shape=jax.ShapeDtypeStruct((B, 2, N), jnp.uint32),
            compiler_params=params_c,
            interpret=_interpret(),
        )(acc, bsk_i, ip[:, None], ineg[:, None],
          g_tw, g_tws, f_tw, f_tws, mono, ninv)
    return call


def blind_rotate_fused(params: TfheParams, bsk_br: jax.Array,
                       acc_br: jax.Array, a: jax.Array,
                       tile: int = 32) -> jax.Array:
    """Fused CGGI accumulation; acc/bsk in BR evaluation order.
    Returns the final accumulator, still BR-ordered."""
    N, q = params.N, params.q
    m_by = (2 * N) // q
    idx_pos = (jnp.where(a == 0, 0, u32(q) - a) * u32(m_by)) & u32(2 * N - 1)
    idx_neg = (u32(2 * N) - idx_pos) & u32(2 * N - 1)
    B = acc_br.shape[0]
    Bt = min(tile, -(-B // 8) * 8)
    Bp = -(-B // Bt) * Bt
    if Bp != B:
        acc_br = jnp.pad(acc_br, ((0, Bp - B), (0, 0), (0, 0)))
        idx_pos = jnp.pad(idx_pos, ((0, Bp - B), (0, 0)))
        idx_neg = jnp.pad(idx_neg, ((0, Bp - B), (0, 0)))
    tabs = _fused_tables(N, params.Q,
                         nttmod.make_plan(N, params.Q).qinv_neg)
    step_call = _step_call(params, Bt)

    def step(acc, xs):
        bsk_i, ip, ineg = xs
        return step_call(acc, bsk_i, ip, ineg, tabs), None

    acc, _ = jax.lax.scan(step, acc_br, (bsk_br, idx_pos.T, idx_neg.T))
    return acc[:B]


def _mega_kernel(acc0_ref, bsk_ref, ip_ref, ineg_ref,
                 gtw_ref, gtws_ref, ftw_ref, ftws_ref, mono_ref,
                 ninv_ref, out_ref, *, params: TfheParams):
    """Whole-scan kernel body: grid = (batch_tiles, n).  The accumulator
    lives in the REVISITED output block -- it stays VMEM-resident for the
    entire n-step scan of one batch tile (written back to HBM once), and
    the per-step BSK block (indexed by the step axis) is double-buffered
    HBM->VMEM by the Pallas grid pipeline, overlapping the key fetch with
    compute (the reference's BSKBufferPool/async_pipeline.h:50-95 role)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = acc0_ref[:]

    # index arrays are laid out [tiles, n, Bt, 1] so the (i, j) block IS
    # this step's per-tile column -- no dynamic lane slicing (Mosaic
    # requires 128-aligned dynamic indices on the lane axis)
    out_ref[:] = _step_body(out_ref[:], bsk_ref[0], ip_ref[0, 0],
                            ineg_ref[0, 0],
                            gtw_ref, gtws_ref, ftw_ref, ftws_ref,
                            mono_ref, ninv_ref, params)


@functools.lru_cache(maxsize=None)
def _mega_call(params: TfheParams, Bt: int, n: int):
    N = params.N
    dg2 = params.digits_g2
    logm = (2 * N).bit_length() - 1
    logN = N.bit_length() - 1
    kern = functools.partial(_mega_kernel, params=params)
    ms = pltpu.ANY if _interpret() else pltpu.VMEM

    def call(acc, bsk_br, ip, ineg, tabs):
        f_tw, f_tws, g_tw, g_tws, mono, ninv = tabs
        B = acc.shape[0]
        grid = (B // Bt, n)
        specs = [
            pl.BlockSpec((Bt, 2, N), lambda i, j: (i, 0, 0),
                         memory_space=ms),
            pl.BlockSpec((1, 2, dg2, 2, N), lambda i, j: (j, 0, 0, 0, 0),
                         memory_space=ms),
            pl.BlockSpec((1, 1, Bt, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=ms),
            pl.BlockSpec((1, 1, Bt, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=ms),
            pl.BlockSpec((logN, N), lambda i, j: (0, 0), memory_space=ms),
            pl.BlockSpec((logN, N), lambda i, j: (0, 0), memory_space=ms),
            pl.BlockSpec((logN, N), lambda i, j: (0, 0), memory_space=ms),
            pl.BlockSpec((logN, N), lambda i, j: (0, 0), memory_space=ms),
            pl.BlockSpec((logm, N), lambda i, j: (0, 0), memory_space=ms),
            pl.BlockSpec((1, 4), lambda i, j: (0, 0), memory_space=ms),
        ]
        params_c = None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=specs,
            out_specs=pl.BlockSpec((Bt, 2, N), lambda i, j: (i, 0, 0),
                                   memory_space=ms),
            out_shape=jax.ShapeDtypeStruct((B, 2, N), jnp.uint32),
            compiler_params=params_c,
            interpret=_interpret(),
        )(acc, bsk_br, ip, ineg, g_tw, g_tws, f_tw, f_tws, mono, ninv)
    return call


def blind_rotate_mega(params: TfheParams, bsk_br: jax.Array,
                      acc_br: jax.Array, a: jax.Array,
                      tile: int = 32) -> jax.Array:
    """Whole-scan fused CGGI accumulation: ONE pallas_call runs all n
    accumulator steps with the accumulator VMEM-resident and the BSK
    streamed.  acc/bsk in BR evaluation order."""
    N, q = params.N, params.q
    n = bsk_br.shape[0]
    m_by = (2 * N) // q
    idx_pos = (jnp.where(a == 0, 0, u32(q) - a) * u32(m_by)) & u32(2 * N - 1)
    idx_neg = (u32(2 * N) - idx_pos) & u32(2 * N - 1)
    B = acc_br.shape[0]
    Bt = min(tile, -(-B // 8) * 8)
    Bp = -(-B // Bt) * Bt
    if Bp != B:
        acc_br = jnp.pad(acc_br, ((0, Bp - B), (0, 0), (0, 0)))
        idx_pos = jnp.pad(idx_pos, ((0, Bp - B), (0, 0)))
        idx_neg = jnp.pad(idx_neg, ((0, Bp - B), (0, 0)))
    tabs = _fused_tables(N, params.Q,
                         nttmod.make_plan(N, params.Q).qinv_neg)
    TI = Bp // Bt
    ip4 = idx_pos.reshape(TI, Bt, n).transpose(0, 2, 1)[..., None]
    in4 = idx_neg.reshape(TI, Bt, n).transpose(0, 2, 1)[..., None]
    call = _mega_call(params, Bt, n)
    out = call(acc_br, bsk_br, ip4, in4, tabs)
    return out[:B]


def bootstrap_core_mega(params: TfheParams, key: rgsw.BootstrapKey,
                        test_vec: jax.Array, a: jax.Array) -> jax.Array:
    """Drop-in for boot.bootstrap_core with impl='mega'."""
    plan = nttmod.make_plan(params.N, params.Q)
    B = test_vec.shape[0]
    acc1 = ntp.forward_pallas(plan, test_vec, out_br=True)[:, None, :]
    acc0 = jnp.zeros((B, 1, params.N), dtype=U32)
    acc_br = jnp.concatenate([acc0, acc1], axis=1)
    bsk_br = bsk_to_br(params, key.bsk)
    rot = blind_rotate_mega(params, bsk_br, acc_br, a)
    br = jnp.asarray(np.asarray(plan.br))
    return jnp.take(rot, br, axis=-1)


def bootstrap_core_fused(params: TfheParams, key: rgsw.BootstrapKey,
                         test_vec: jax.Array, a: jax.Array) -> jax.Array:
    """Test vector (COEFF) -> fused blind rotation -> NATURAL-order
    accumulator (drop-in for boot.bootstrap_core with impl='fused')."""
    plan = nttmod.make_plan(params.N, params.Q)
    B = test_vec.shape[0]
    acc1 = ntp.forward_pallas(plan, test_vec, out_br=True)[:, None, :]
    acc0 = jnp.zeros((B, 1, params.N), dtype=U32)
    acc_br = jnp.concatenate([acc0, acc1], axis=1)
    bsk_br = bsk_to_br(params, key.bsk)
    rot = blind_rotate_fused(params, bsk_br, acc_br, a)
    # BR -> natural (bit reversal is an involution)
    br = jnp.asarray(np.asarray(plan.br))
    return jnp.take(rot, br, axis=-1)
