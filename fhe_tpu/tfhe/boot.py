"""Gate bootstrapping: test-vector init, CGGI blind rotation, extraction.

Semantics mirror the reference BinFHEScheme
(/root/reference/src/binfhe/lib/binfhe-base-scheme.cpp BootstrapGateCore
:525-583, EvalBinGate :76-127; rgsw-acc-cggi.cpp EvalAcc :61-70,
AddToAccCGGI :104-150), re-architected for TPU:

* the n-step accumulator loop is a `lax.scan` whose carry is the batched
  accumulator [B, 2, N]; each step runs two batched MXU NTTs (inverse of the
  accumulator, forward of the gadget digits) and a VPU external product;
* the monomial (X^idx - 1) multiplication happens analytically in
  EVALUATION format -- its value at point psi^(2k+1) is psi^((2k+1)*idx)-1,
  a gather from a 2N-entry Montgomery power table -- instead of the
  reference's precomputed monomial polys (rgsw-cryptoparameters.cpp);
* the whole gate (linear combo -> blind rotate -> extract -> mod/key
  switch) is one jittable pure function over a ciphertext batch.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..math import ntt as nttmod
from ..math.modmath import (U32, add_mod, sub_mod, u32, mont_mul)
from .params import TfheParams, Gate
from . import lwe, rgsw


@functools.lru_cache(maxsize=None)
def psi_powers_mont(N: int, Q: int) -> np.ndarray:
    """[2N] table of psi^e mod Q in Montgomery form (psi = 2N-th root).

    Returns host numpy (NOT a device array): this is called inside jit
    traces, and caching a trace-created constant would leak tracers."""
    plan = nttmod.make_plan(N, Q)
    acc, out = 1, np.zeros(2 * N, dtype=np.uint32)
    for e in range(2 * N):
        out[e] = (acc << 32) % Q
        acc = acc * plan.psi % Q
    return out


@functools.lru_cache(maxsize=None)
def _mono_sq_tables(N: int, Q: int) -> np.ndarray:
    """P[j, k] = psi^(2^j * (2k+1)) mod Q in Montgomery form, for the
    exponentiation-by-squaring monomial evaluation."""
    plan = nttmod.make_plan(N, Q)
    logm = (2 * N).bit_length() - 1
    k = np.arange(N, dtype=np.int64)
    pows = np.zeros(2 * N, dtype=np.uint64)
    acc = 1
    for t in range(2 * N):
        pows[t] = acc
        acc = acc * plan.psi % Q
    out = np.zeros((logm, N), dtype=np.uint32)
    for j in range(logm):
        e = ((1 << j) * (2 * k + 1)) % (2 * N)
        out[j] = ((pows[e].astype(object) << 32) % Q
                  ).astype(np.uint64).astype(np.uint32)
    return out


@functools.lru_cache(maxsize=None)
def _mono_sq_tables_plain(N: int, Q: int) -> tuple[np.ndarray, np.ndarray]:
    """Plain-form P[j, k] = psi^(2^j * (2k+1)) mod Q plus Shoup duals
    floor(P * 2^32 / Q): the exponentiation chain then runs as
    constant-operand Shoup multiplies and yields PLAIN-form monomials
    (paired with the Shoup external product, whose output is
    Montgomery-formed -- the final mont_mul cancels the forms)."""
    plan = nttmod.make_plan(N, Q)
    logm = (2 * N).bit_length() - 1
    k = np.arange(N, dtype=np.int64)
    pows = np.zeros(2 * N, dtype=np.uint64)
    acc = 1
    for t in range(2 * N):
        pows[t] = acc
        acc = acc * plan.psi % Q
    out = np.zeros((logm, N), dtype=np.uint32)
    for j in range(logm):
        e = ((1 << j) * (2 * k + 1)) % (2 * N)
        out[j] = pows[e].astype(np.uint32)
    dual = ((out.astype(np.uint64) << np.uint64(32)) // np.uint64(Q)
            ).astype(np.uint32)
    return out, dual


def _monomial_pow_eval(params: TfheParams, idx: jax.Array,
                       zero_low_bits: int = 0) -> jax.Array:
    """EVALUATION-format values of X^idx, Montgomery form:
    w[b, k] = psi^((2k+1) * idx[b]) * R mod Q, by exponentiation-by-
    squaring over log2(2N) constant tables (selected per idx bit) --
    pure VPU work.  The equivalent [B, N] gather from the psi-power
    table lowers to a slow path on TPU (~8x slower measured).

    zero_low_bits: caller guarantee that idx is a multiple of
    2^zero_low_bits (blind rotation scales the mask by 2N/q), letting
    the chain skip the statically-dead low squaring rounds."""
    N, Q = params.N, params.Q
    plan = nttmod.make_plan(N, Q)
    tables = jnp.asarray(_mono_sq_tables(N, Q))
    logm = (2 * N).bit_length() - 1
    r1 = np.uint32((1 << 32) % Q)                # Montgomery form of 1
    w = jnp.full(idx.shape + (N,), r1, dtype=U32)
    for j in range(zero_low_bits, logm):
        bit = ((idx >> j) & u32(1))[..., None]
        wm = mont_mul(w, tables[j][None, :], Q, u32(plan.qinv_neg))
        w = jnp.where(bit == 1, wm, w)
    return w


def monomial_minus_one_eval(params: TfheParams, idx: jax.Array) -> jax.Array:
    """EVALUATION-format values of (X^idx - 1), Montgomery form."""
    Q = params.Q
    r1 = np.uint32((1 << 32) % Q)
    return sub_mod(_monomial_pow_eval(params, idx), u32(r1), Q)


def monomial_pair_eval(params: TfheParams, idx: jax.Array,
                       zero_low_bits: int = 0
                       ) -> tuple[jax.Array, jax.Array]:
    """(X^idx - 1, X^{-idx} - 1) in EVALUATION Montgomery form from ONE
    exponentiation chain: the eval points (2k+1) pair up as
    2(N-1-k)+1 = 2N-(2k+1) = -(2k+1) mod 2N, so the negative-exponent
    values are exactly the k-axis flip of the positive ones -- halves
    the monomial VPU work of every blind-rotate step (bit-identical to
    two independent chains)."""
    Q = params.Q
    r1 = np.uint32((1 << 32) % Q)
    w = _monomial_pow_eval(params, idx, zero_low_bits)
    return (sub_mod(w, u32(r1), Q),
            sub_mod(jnp.flip(w, axis=-1), u32(r1), Q))


def monomial_pair_plain(params: TfheParams, idx: jax.Array,
                        zero_low_bits: int = 0
                        ) -> tuple[jax.Array, jax.Array]:
    """monomial_pair_eval in PLAIN form via a Shoup exponentiation
    chain (constant tables + duals): ~40% fewer VPU ops per round."""
    N, Q = params.N, params.Q
    tables, duals = _mono_sq_tables_plain(N, Q)
    tables, duals = jnp.asarray(tables), jnp.asarray(duals)
    logm = (2 * N).bit_length() - 1
    w = jnp.full(idx.shape + (N,), np.uint32(1), dtype=U32)
    for j in range(zero_low_bits, logm):
        bit = ((idx >> j) & u32(1))[..., None]
        wm = nttmod.shoup_mul(w, tables[j][None, :], duals[j][None, :], Q)
        w = jnp.where(bit == 1, wm, w)
    one = u32(np.uint32(1))
    return (sub_mod(w, one, Q), sub_mod(jnp.flip(w, axis=-1), one, Q))


def blind_rotate(params: TfheParams, bsk: jax.Array, acc: jax.Array,
                 a: jax.Array, ntt_impl: str | None = None,
                 a_modulus: int | None = None,
                 plan: nttmod.NttPlan | None = None,
                 mxu: "nttmod.MxuTables | None" = None,
                 bsk_shoup: jax.Array | None = None) -> jax.Array:
    """CGGI accumulation (rgsw-acc-cggi.cpp EvalAcc/AddToAccCGGI).

    bsk: [n, 2, dG2, 2, N] uint32 (EVALUATION, Montgomery);
    acc: [B, 2, N] uint32 (EVALUATION, plain form);
    a:   [B, n] uint32, the LWE mask mod q (or mod a_modulus if given).

    With bsk_shoup, the per-step constant multiplies (external product,
    monomial chain) run as Shoup products; forms stay consistent because
    the Shoup external product yields Montgomery-formed values and the
    plain-form monomial's mont_mul cancels the R factor -- final plain
    values are bit-identical to the Montgomery path.
    """
    N, Q = params.N, params.Q
    q = params.q if a_modulus is None else a_modulus
    plan = plan if plan is not None else nttmod.make_plan(N, Q)
    m_by_mod = (2 * N) // q
    # idx_pos[b, i] = ((q - a[b,i]) mod q) * 2N/q, in [0, 2N)
    idx_pos = (jnp.where(a == 0, 0, u32(q) - a) * u32(m_by_mod)) & u32(2 * N - 1)
    # every idx is a multiple of 2N/q -- those low squaring rounds of the
    # monomial chain are statically dead
    zlb = (m_by_mod.bit_length() - 1) if (m_by_mod & (m_by_mod - 1)) == 0 else 0

    def step(acc, xs):
        if bsk_shoup is None:
            bsk_i, ip = xs             # [2, dG2, 2, N], [B]
            sh = (None, None)
        else:
            bsk_i, sh_i, ip = xs
            sh = (sh_i[0], sh_i[1])
        c = nttmod.ntt_inverse(plan, acc, ntt_impl, mxu)     # [B, 2, N]
        digits = rgsw.signed_digit_decompose(params, c)      # [B, dG2, N]
        d_eval = rgsw.ntt_signed_digits(plan, digits, ntt_impl, mxu)
        ep_pos = rgsw.external_product(plan, d_eval, bsk_i[0], sh[0])
        ep_neg = rgsw.external_product(plan, d_eval, bsk_i[1], sh[1])
        if bsk_shoup is None:
            mp, mn = monomial_pair_eval(params, ip, zlb)
        else:
            mp, mn = monomial_pair_plain(params, ip, zlb)
        mono_p = mp[:, None, :]
        mono_n = mn[:, None, :]
        upd = add_mod(nttmod.pointwise_mont(plan, ep_pos, mono_p),
                      nttmod.pointwise_mont(plan, ep_neg, mono_n), Q)
        return add_mod(acc, upd, Q), None

    xs = ((bsk, idx_pos.T) if bsk_shoup is None
          else (bsk, bsk_shoup, idx_pos.T))
    import os
    # unroll amortizes per-iteration scan overhead (swept on v5e:
    # 1368/1415/1398 gates/s at unroll 4/8/16, B=2048 STD128) but
    # multiplies XLA COMPILE time; only worth it where compiles are
    # cached across thousands of batched gates (the TPU), not on the
    # CPU test mesh where every test compiles a fresh pipeline.
    default_unroll = "8" if jax.default_backend() == "tpu" else "1"
    unroll = int(os.environ.get("FHE_SCAN_UNROLL", default_unroll))
    acc, _ = jax.lax.scan(step, acc, xs, unroll=unroll)
    return acc


def gate_constants(params: TfheParams, gate: Gate, p: int = 4) -> np.ndarray:
    """Host: [lb, ub, lv, uv] uint32 for the gate test vector
    (BootstrapGateCore:536-556). Passed traced so every gate shares one
    compiled pipeline."""
    Q, q = params.Q, params.q
    q_half = q >> 1
    q1 = params.gate_const(gate)
    q2 = (q1 + q_half) % q
    swap = q1 >= q2
    lb, ub = (q2, q1) if swap else (q1, q2)
    q2p = Q // (p * 2) + 1
    lv = q2p if swap else Q - q2p
    uv = Q - q2p if swap else q2p
    return np.array([lb, ub, lv, uv], dtype=np.uint32)


def make_gate_test_vector(params: TfheParams, b: jax.Array,
                          consts: jax.Array) -> jax.Array:
    """Accumulator init m for gate bootstrapping, COEFFICIENT format
    (binfhe-base-scheme.cpp BootstrapGateCore:557-576).

    b: [B] uint32 LWE body mod q; consts: [4] uint32 from gate_constants.
    Returns [B, N] uint32.
    """
    N, q = params.N, params.q
    q_half = q >> 1
    lb, ub, lv, uv = consts[0], consts[1], consts[2], consts[3]
    factor = N // q_half
    j = jnp.arange(q_half, dtype=U32)[None, :]
    bj = sub_mod(b[:, None], j, q)                      # [B, q/2]
    vals = jnp.where((bj >= lb) & (bj < ub), lv, uv)
    # sparse embedding: value at coefficient j*factor -- built by an
    # interleave-reshape instead of a scatter so batch sharding propagates
    pad = jnp.zeros(vals.shape + (factor - 1,), dtype=U32)
    return jnp.concatenate([vals[..., None], pad], axis=-1
                           ).reshape(b.shape + (N,))


def make_func_test_vector(params: TfheParams, b: jax.Array, f_table: jax.Array,
                          f_mod: int) -> jax.Array:
    """Accumulator init for functional bootstrap (BootstrapFuncCore:589-625).

    f_table: [q] uint32 with f_table[v] = f(v, q, fmod) in [0, fmod);
    coefficient j*factor gets Q/fmod * f((b - j) mod q)."""
    N, Q, q = params.N, params.Q, params.q
    factor = (2 * N) // q
    j = jnp.arange(q >> 1, dtype=U32)[None, :]
    bj = sub_mod(b[:, None], j, q)
    fv = jnp.take(f_table, bj.astype(jnp.int32), axis=0)
    vals = u32(Q // f_mod) * fv                          # < Q, exact
    pad = jnp.zeros(vals.shape + (factor - 1,), dtype=U32)
    return jnp.concatenate([vals[..., None], pad], axis=-1
                           ).reshape(b.shape + (N,))


def bootstrap_core(params: TfheParams, bsk, test_vec: jax.Array,
                   a: jax.Array, ntt_impl: str | None = None,
                   a_modulus: int | None = None,
                   plan: nttmod.NttPlan | None = None,
                   mxu: "nttmod.MxuTables | None" = None):
    """Blind-rotate a COEFFICIENT test vector by the mask `a`; returns the
    accumulator [B, 2, N] in EVALUATION format.

    bsk: raw key array, or a full rgsw.BootstrapKey (required for the
    'mega2' megakernel, which needs the Shoup dual)."""
    plan = plan if plan is not None else nttmod.make_plan(params.N, params.Q)
    B = test_vec.shape[0]
    key = bsk if isinstance(bsk, rgsw.BootstrapKey) else None
    if ntt_impl == "mega2" and key is not None:
        from . import boot_mxu
        impl = "mxu" if mxu is not None else (
            "mxu" if jax.default_backend() == "tpu" else "butterfly")
        acc1 = nttmod.ntt_forward(plan, test_vec, impl, mxu)[:, None, :]
        acc0 = jnp.zeros((B, 1, params.N), dtype=U32)
        acc = jnp.concatenate([acc0, acc1], axis=1)
        return boot_mxu.blind_rotate_mega2(params, key.bsk, key.bsk_shoup,
                                           acc, a, a_modulus=a_modulus)
    bsk_arr = key.bsk if key is not None else bsk
    bsk_sh = key.bsk_shoup if key is not None else None
    acc0 = jnp.zeros((B, 1, params.N), dtype=U32)
    acc1 = nttmod.ntt_forward(plan, test_vec, ntt_impl, mxu)[:, None, :]
    acc = jnp.concatenate([acc0, acc1], axis=1)
    return blind_rotate(params, bsk_arr, acc, a, ntt_impl, a_modulus, plan,
                        mxu, bsk_shoup=bsk_sh)


def run_accumulator(params: TfheParams, key, test_vec: jax.Array,
                    a: jax.Array, ntt_impl: str | None = None,
                    plan: nttmod.NttPlan | None = None, mxu=None):
    """Method dispatch over jittable accumulators (GINX/CGGI and DM/AP;
    LMKCDEY is host-orchestrated in _finish_gate).  test_vec [B, N]
    COEFFICIENT; returns acc [B, 2, N] EVALUATION."""
    from . import acc as accmod
    plan = plan if plan is not None else nttmod.make_plan(params.N, params.Q)
    if ntt_impl == "fused" and isinstance(key, rgsw.BootstrapKey):
        from . import boot_pallas
        return boot_pallas.bootstrap_core_fused(params, key, test_vec, a)
    if ntt_impl == "mega" and isinstance(key, rgsw.BootstrapKey):
        from . import boot_pallas
        return boot_pallas.bootstrap_core_mega(params, key, test_vec, a)
    if ntt_impl == "mega2" and isinstance(key, rgsw.BootstrapKey):
        from . import boot_mxu
        return boot_mxu.bootstrap_core_mega2(params, key, test_vec, a, mxu)
    B = test_vec.shape[0]
    acc0 = jnp.zeros((B, 1, params.N), dtype=U32)
    acc1 = nttmod.ntt_forward(plan, test_vec, ntt_impl, mxu)[:, None, :]
    acc = jnp.concatenate([acc0, acc1], axis=1)
    if isinstance(key, rgsw.BootstrapKey):
        return blind_rotate(params, key.bsk, acc, a, ntt_impl, None, plan,
                            mxu, bsk_shoup=key.bsk_shoup)
    if isinstance(key, accmod.DmKey):
        return accmod.blind_rotate_dm(params, key.bsk, acc, a, ntt_impl,
                                      plan, mxu)
    raise TypeError(f"unsupported key type {type(key)} in jitted pipeline")


def extract_lwe(params: TfheParams, acc: jax.Array, b_offset,
                ntt_impl: str | None = None,
                plan: nttmod.NttPlan | None = None,
                mxu: "nttmod.MxuTables | None" = None) -> lwe.LweCiphertext:
    """Transpose + constant-term extraction (EvalBinGate :111-124).

    The a-poly transpose a(X) -> a(X^(2N-1)) is a flip in natural-order
    EVALUATION format; b = b_offset + acc1.coef[0] mod Q (b_offset is a
    uint32 scalar, already reduced mod Q)."""
    Q = params.Q
    plan = plan if plan is not None else nttmod.make_plan(params.N, Q)
    a_t_eval = jnp.flip(acc[:, 0, :], axis=-1)
    both = jnp.stack([a_t_eval, acc[:, 1, :]], axis=1)
    coef = nttmod.ntt_inverse(plan, both, ntt_impl, mxu)
    a_coef = coef[:, 0, :]
    b = add_mod(coef[:, 1, 0], u32(b_offset), Q)
    return lwe.LweCiphertext(a=a_coef, b=b, modulus=Q, pt_mod=4)


def auto_gate_impl(params: TfheParams, key) -> str | None:
    """Pick the gate-pipeline accumulator implementation: the lane-factored
    MXU megakernel (boot_mxu) wherever it applies on TPU -- measured 3,871
    gates/s vs 1,395 for the unfused dense-MXU path at STD128 b2048."""
    from . import rgsw
    if (jax.default_backend() == "tpu"
            and isinstance(key, rgsw.BootstrapKey)
            and key.bsk_shoup is not None
            and params.Q < (1 << 31)
            and params.N % 128 == 0
            and (params.N // 128) & (params.N // 128 - 1) == 0
            and -(-params.Q.bit_length() // 7) in (3, 4)):
        return "mega2"
    return None


def resolve_ntt(params: TfheParams, ntt_impl: str | None):
    """Host: resolve the NTT implementation and fetch plan + (lazy) MXU
    tables.  Tables are returned so callers pass them as jit ARGUMENTS --
    closing over them would bake multi-MB constants into every jaxpr."""
    impl = ntt_impl or nttmod._auto_impl(params.N)
    if impl == "mxu" and params.N >= nttmod.FOURSTEP_MIN_N:
        impl = "fourstep"        # dense [dN, dN] table would be ~GBs
    plan = nttmod.make_plan(params.N, params.Q)
    mxu = (nttmod.make_mxu(params.N, params.Q)
           if impl in ("mxu", "mega2") else None)
    return impl, plan, mxu


@functools.lru_cache(maxsize=None)
def _jitted_finish(params: TfheParams, p: int, extended: bool,
                   ntt_impl: str | None):
    """One compiled gate pipeline per (paramset, ptmod, extended): the gate
    identity enters only through the traced constant vector."""
    def fn(key: rgsw.BootstrapKey, comb: lwe.LweCiphertext,
           consts: jax.Array, b_offset: jax.Array,
           plan, mxu) -> lwe.LweCiphertext:
        Q = params.Q
        lead = comb.batch_shape
        a = comb.a.reshape(-1, params.n)
        b = comb.b.reshape(-1)
        tv = make_gate_test_vector(params, b, consts)
        acc = run_accumulator(params, key, tv, a, ntt_impl, plan, mxu)
        # megakernel v2 yields natural-order EVAL; extract rides the MXU
        ex_impl = "mxu" if ntt_impl == "mega2" else ntt_impl
        ct_ext = extract_lwe(params, acc, b_offset, ex_impl, plan, mxu)
        ct_ext = lwe.LweCiphertext(a=ct_ext.a.reshape(*lead, params.N),
                                   b=ct_ext.b.reshape(lead), modulus=Q,
                                   pt_mod=p)
        if extended:
            return ct_ext
        return lwe.switch_ct_to_qn(params, key.ksk, ct_ext)
    return jax.jit(fn)


def eval_bin_gate(params: TfheParams, key: rgsw.BootstrapKey, gate: Gate,
                  ct1: lwe.LweCiphertext, ct2: lwe.LweCiphertext,
                  extended: bool = False,
                  ntt_impl: str | None = None) -> lwe.LweCiphertext:
    """Two-input bootstrapped gate (binfhe-base-scheme.cpp EvalBinGate:76).

    ct1/ct2: [B]-batched LWE ciphertexts mod q, dim n."""
    Q = params.Q
    cct1 = (lwe.switch_ct_to_qn(params, key.ksk, ct1)
            if ct1.modulus == Q else ct1)
    cct2 = (lwe.switch_ct_to_qn(params, key.ksk, ct2)
            if ct2.modulus == Q else ct2)
    comb = lwe.add(cct1, cct2)
    if gate in (Gate.XOR, Gate.XNOR, Gate.XOR_FAST, Gate.XNOR_FAST):
        comb = lwe.add(comb, comb)
    return _finish_gate(params, key, gate, comb, 4, extended, ntt_impl)


def eval_bin_gate_multi(params: TfheParams, key: rgsw.BootstrapKey, gate: Gate,
                        cts: list[lwe.LweCiphertext], extended: bool = False,
                        ntt_impl: str | None = None) -> lwe.LweCiphertext:
    """3/4-input gates + MAJORITY (EvalBinGate vector overload :129-185)."""
    if gate not in (Gate.AND3, Gate.OR3, Gate.AND4, Gate.OR4, Gate.MAJORITY):
        raise ValueError(f"multi-input form not defined for {gate}")
    Q = params.Q
    comb = (lwe.switch_ct_to_qn(params, key.ksk, cts[0])
            if cts[0].modulus == Q else cts[0])
    for ct in cts[1:]:
        nxt = (lwe.switch_ct_to_qn(params, key.ksk, ct)
               if ct.modulus == Q else ct)
        comb = lwe.add(comb, nxt)
    return _finish_gate(params, key, gate, comb, comb.pt_mod, extended,
                        ntt_impl)


def _finish_gate(params: TfheParams, key, gate: Gate,
                 comb: lwe.LweCiphertext, p: int, extended: bool,
                 ntt_impl: str | None) -> lwe.LweCiphertext:
    consts = jnp.asarray(gate_constants(params, gate, p))
    b_offset = jnp.asarray(np.uint32(params.Q // (p * 2) + 1))
    if ntt_impl is None:
        ntt_impl = auto_gate_impl(params, key)
    impl, plan, mxu = resolve_ntt(params, ntt_impl)
    from . import acc as accmod
    if isinstance(key, accmod.LmkcdeyKey):
        # trace-time schedule + ONE jitted scan (acc.lmk_schedule /
        # blind_rotate_lmkcdey_scan); FHE_LMK_EAGER=1 selects the
        # reference-shaped host-orchestrated loop (kept as the
        # bit-exactness anchor)
        import os
        lead = comb.batch_shape
        a = comb.a.reshape(-1, params.n)
        b = comb.b.reshape(-1)
        tv = make_gate_test_vector(params, b, consts)
        acc0 = jnp.concatenate(
            [jnp.zeros((tv.shape[0], 1, params.N), dtype=U32),
             nttmod.ntt_forward(plan, tv, impl, mxu)[:, None, :]], axis=1)
        if os.environ.get("FHE_LMK_EAGER") == "1":
            rot = accmod.blind_rotate_lmkcdey(params, key.rgsw, key.auto,
                                              acc0, np.asarray(a), impl, mxu)
        else:
            rot = accmod.blind_rotate_lmkcdey_scan(params, key.rgsw,
                                                   key.auto, acc0,
                                                   np.asarray(a), impl, mxu)
        ct_ext = extract_lwe(params, rot, b_offset, impl, plan, mxu)
        ct_ext = lwe.LweCiphertext(a=ct_ext.a.reshape(*lead, params.N),
                                   b=ct_ext.b.reshape(lead),
                                   modulus=params.Q, pt_mod=p)
        if extended:
            return ct_ext
        return lwe.switch_ct_to_qn(params, key.ksk, ct_ext)
    fn = _jitted_finish(params, p, extended, impl)
    return fn(key, comb, consts, b_offset, plan, mxu)


def bootstrap(params: TfheParams, key: rgsw.BootstrapKey,
              ct: lwe.LweCiphertext, extended: bool = False,
              ntt_impl: str | None = None) -> lwe.LweCiphertext:
    """Plain refresh bootstrap (Bootstrap :188-218): shifts b by q/4 then
    runs the AND-gate pipeline on the single ciphertext."""
    q = params.q
    b_shift = add_mod(ct.b, u32(q >> 2), q)
    shifted = lwe.LweCiphertext(a=ct.a, b=b_shift, modulus=q,
                                pt_mod=ct.pt_mod)
    return _finish_gate(params, key, Gate.AND, shifted, ct.pt_mod,
                        extended, ntt_impl)
