"""RGSW bootstrapping keys, gadget decomposition, external product (CGGI).

Semantics mirror the reference accumulator
(/root/reference/src/binfhe/lib/rgsw-acc-cggi.cpp KeyGenCGGI :73-100,
rgsw-acc.cpp SignedDigitDecompose :54-91 -- approximate gadget, first digit
dropped, balanced digits in [-Bg/2, Bg/2)), re-architected for TPU:

* BSK generation samples on host but computes all NTTs on device in one
  batched transform; the key is stored in EVALUATION format and Montgomery
  form so every external-product multiply is a single REDC.
* The external product contracts the digit axis with pointwise Montgomery
  multiplies on the VPU; the digit NTTs ride the MXU via the signed
  two-plane matmul path (ntt.forward_mxu_signed2).

Supported ring moduli are Q < 2^31 (single uint32 limb) -- this covers
TOY/MEDIUM/STD128*/STD128Q/STD256*/LPF*; the >=2^34 paramsets (STD192*,
STD128Q_3/4) need the 2-limb RNS accumulator, planned as rgsw_rns.py.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..math import ntt as nttmod
from ..math.modmath import (U32, add_mod, u32, mont_constants, mont_mul)
from .params import TfheParams, KeyDist
from . import lwe


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BootstrapKey:
    """CGGI bootstrap key.

    bsk: [n, 2, dG2, 2, N] uint32 -- EVALUATION format, Montgomery form.
         axis 1: sign (0: s_i==1 key, 1: s_i==-1 key);
         axis 2: gadget row r (digit (r>>1)+1 of poly r&1);
         axis 3: RLWE column (a, b).
    bsk_shoup: same shape, floor(bsk * 2^32 / Q) -- Shoup duals so the
         external product runs as constant-operand Shoup multiplies
         (the reference's ModMulFastConst, ubintnat.h) instead of full
         Montgomery REDCs; None falls back to the Montgomery path.
    ksk: LWE switching key N->n.
    """
    bsk: jax.Array
    ksk: lwe.LweSwitchingKey
    bsk_shoup: jax.Array | None = None


def gadget_powers(params: TfheParams) -> np.ndarray:
    """Gpow_r = Bg^((r>>1)+1) mod Q for r in [0, dG2): the message scale of
    gadget row r under the approximate (first-digit-dropped) gadget."""
    return np.array(
        [pow(params.base_g, (r >> 1) + 1, params.Q)
         for r in range(params.digits_g2)], dtype=np.uint32)


def bsk_gen(params: TfheParams, sk: lwe.LweSecretKey, sk_n: lwe.LweSecretKey,
            rng: np.random.Generator) -> jax.Array:
    """Generate the CGGI bootstrap key (rgsw-acc-cggi.cpp:40-100).

    sk: LWE secret (dim n, ternary); sk_n: ring secret (dim N).
    Returns bsk [n, 2, dG2, 2, N] uint32 (EVALUATION, Montgomery).
    """
    Q, N, n = params.Q, params.N, params.n
    dg2 = params.digits_g2
    plan = nttmod.make_plan(N, Q)

    # host sampling (uniform a, gaussian e), exact integers
    a = rng.integers(0, Q, size=(n, 2, dg2, N), dtype=np.int64)
    e = lwe._sample_error(rng, (n, 2, dg2, N), params.std_dev) % Q
    s = np.asarray(sk.s, dtype=np.int64)
    if np.abs(s).max() > 1:
        # the two-column CMUX key can only represent ternary secrets; a
        # Gaussian secret (e.g. STD128_LMKCDEY's) would silently lose
        # every |s_i| >= 2 coefficient — use the LMKCDEY accumulator
        raise ValueError(
            "GINX bootstrap keys require a ternary secret "
            f"(got |s| up to {int(np.abs(s).max())}); Gaussian-secret "
            "paramsets must use method=LMKCDEY")
    m = np.stack([(s == 1), (s == -1)], axis=1).astype(np.uint32)  # [n, 2]

    skn_coef = (np.asarray(sk_n.s, dtype=np.int64) % Q).astype(np.uint32)
    gpow = gadget_powers(params)

    return _bsk_device(plan, params,
                       jnp.asarray(a.astype(np.uint32)),
                       jnp.asarray(e.astype(np.uint32)),
                       jnp.asarray(m),
                       jnp.asarray(skn_coef),
                       jnp.asarray(gpow))


def _bsk_device(plan: nttmod.NttPlan, params: TfheParams,
                a, e, m, skn_coef, gpow) -> jax.Array:
    """Device part of BSK gen: batched NTTs + pointwise assembly."""
    Q = params.Q
    n, _, dg2, N = a.shape
    skn_eval = nttmod.ntt_forward(plan, skn_coef)          # [N]
    skn_mont = nttmod.to_mont(plan, skn_eval)
    a_eval = nttmod.ntt_forward(plan, a.reshape(-1, N)).reshape(n, 2, dg2, N)
    e_eval = nttmod.ntt_forward(plan, e.reshape(-1, N)).reshape(n, 2, dg2, N)

    # message term: the constant poly m*Gpow_r has the same value at every
    # evaluation point; row r adds it to column r&1 (m is 0/1, gpow < Q, so
    # the plain uint32 product is already reduced).
    msg_val = m[:, :, None, None].astype(U32) * gpow[None, None, :, None]
    row_is_odd = (jnp.arange(dg2, dtype=U32) & 1)[None, None, :, None]
    col0 = add_mod(a_eval, jnp.where(row_is_odd == 0, msg_val, 0), Q)
    prod = nttmod.pointwise_mont(plan, a_eval, skn_mont)
    col1 = add_mod(e_eval, prod, Q)
    col1 = add_mod(col1, jnp.where(row_is_odd == 1, msg_val, 0), Q)
    bsk = jnp.stack([col0, col1], axis=3)                  # [n, 2, dg2, 2, N]
    return nttmod.to_mont(plan, bsk)


def signed_digit_decompose(params: TfheParams, c: jax.Array) -> jax.Array:
    """Approximate signed base-Bg decomposition (rgsw-acc.cpp:54-91).

    c: [..., 2, N] uint32 coefficients in [0, Q).
    Returns digits [..., dG2, N] int32 in [-Bg/2, Bg/2), interleaved as
    r = 2*t + poly (digit t of poly `poly`), with digit 0 dropped.
    """
    Q = params.Q
    g_bits = params.base_g.bit_length() - 1
    bg = params.base_g
    dgt = params.digits_g
    dg = dgt - 1
    d = c.astype(jnp.int32)
    d = jnp.where(d >= jnp.int32(Q >> 1), d - jnp.int32(Q), d)
    # closed-form balanced digits (no sequential borrow chain): adding
    # offset = sum_t (Bg/2) * Bg^t turns balanced digits into plain
    # unsigned digits of (d + offset), each minus Bg/2 -- all digits
    # computable in parallel on the VPU.  Requires Q * Bg < 2^31.
    offset = sum((bg >> 1) << (g_bits * t) for t in range(dgt))
    u = d + jnp.int32(offset)
    outs = [((u >> (g_bits * t)) & jnp.int32(bg - 1)) - jnp.int32(bg >> 1)
            for t in range(1, dgt)]            # drop digit 0
    # outs[t]: [..., 2, N] -> interleave to [..., 2*dg, N] with r = 2t+poly
    st = jnp.stack(outs, axis=-3)                          # [..., dg, 2, N]
    shape = st.shape[:-3] + (2 * dg, st.shape[-1])
    return st.reshape(shape)


def ntt_signed_digits(plan: nttmod.NttPlan, digits: jax.Array,
                      impl: str | None = None,
                      mxu: "nttmod.MxuTables | None" = None) -> jax.Array:
    """Forward NTT of small signed digits -> uint32 EVALUATION."""
    impl = impl or ("mxu" if jax.default_backend() == "tpu" else "butterfly")
    if impl == "mxu" and plan.q < (1 << 31):
        lo, hi = nttmod.balanced_base128(digits)
        return nttmod.forward_mxu_signed2(plan, lo, hi, mxu)
    dmod = (digits % jnp.int32(plan.q)).astype(U32)
    return nttmod.ntt_forward(plan, dmod, impl)


def shoup_dual(bsk: jax.Array, Q: int) -> jax.Array:
    """Host: floor(v * 2^32 / Q) for every uint32 entry (Shoup
    precomputation for constant-operand multiplies)."""
    v = np.asarray(bsk).astype(np.uint64)
    return jnp.asarray(((v << np.uint64(32)) // np.uint64(Q))
                       .astype(np.uint32))


def external_product(plan: nttmod.NttPlan, d_eval: jax.Array,
                     bsk_rows: jax.Array,
                     bsk_shoup: jax.Array | None = None) -> jax.Array:
    """sum_r d_eval[..., r, :] * bsk_rows[r, c, :] -> [..., 2, N].

    d_eval: [..., dG2, N] uint32 plain form (EVALUATION);
    bsk_rows: [dG2, 2, N] uint32 Montgomery form (EVALUATION).

    Without bsk_shoup: Montgomery REDC products, result in PLAIN form.
    With bsk_shoup (floor(bsk*2^32/Q)): constant-operand Shoup products
    (~40% fewer VPU ops), result stays MONTGOMERY-formed (value*R) --
    the caller's next multiply by a PLAIN-form operand (the monomial)
    via mont_mul lands back on plain, so the net pipeline is form-exact
    and bit-identical."""
    q = plan.q
    if bsk_shoup is None:
        prod = mont_mul(d_eval[..., :, None, :], bsk_rows, q,
                        u32(plan.qinv_neg))
    else:
        prod = nttmod.shoup_mul(d_eval[..., :, None, :], bsk_rows,
                                bsk_shoup, q)
    # fold the digit axis with modular adds (few terms; values < q)
    acc = prod[..., 0, :, :]
    for r in range(1, prod.shape[-3]):
        acc = add_mod(acc, prod[..., r, :, :], q)
    return acc
