"""2-limb RNS ring accumulator: TFHE gate bootstrapping for Q >= 2^31.

The reference evaluates the STD192*/STD128Q_3/4/STD256Q_4 paramsets on a
single 37..50-bit NativeInteger ring modulus (rgsw-cryptoparameters.h);
uint32 TPU words cannot hold those, so the ring is a 2-limb RNS pair
Q = q1*q2 (both NTT-friendly, ~q_bits total -- tfhe/params.py) and the
accumulator carries [B, 2, L=2, N] tensors: every NTT/pointwise op runs
limb-stacked through lattice.rns machinery.

The one place RNS is insufficient is the signed gadget decomposition
(rgsw-acc.cpp SignedDigitDecompose needs the INTEGER value): coefficients
are reconstructed on-device with Garner mixed-radix (v = x1 + q1*t,
t = (x2-x1)/q1 mod q2) into (hi, lo) uint32 word pairs -- TPU has no
native u64 -- then centered, offset, and digit-extracted in parallel
(modmath.u64_* helpers).

Sample extraction + the Q -> qKS mod switch run host-side in numpy
uint64 (once per gate, outside the n-step scan); the LWE key switch back
to dim n reuses the standard device path."""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..math import ntt as nttmod
from ..math.modmath import (U32, u32, add_mod, sub_mod, mont_mul,
                            mul32_parts, u64_add, u64_add_const, u64_sub,
                            u64_geq, u64_shr)
from ..lattice import rns
from .params import TfheParams, Gate
from . import lwe, boot, rgsw


def _plan(params: TfheParams) -> rns.RnsPlan:
    return rns.make_rns_plan(params.N, tuple(params.moduli_rns))


@functools.lru_cache(maxsize=None)
def _garner_consts(params: TfheParams):
    q1, q2 = params.moduli_rns
    q1inv_q2 = pow(q1, -1, q2)
    Q = q1 * q2
    dgt = params.digits_g
    bg = params.base_g
    g_bits = bg.bit_length() - 1
    offset = sum((bg >> 1) << (g_bits * t) for t in range(dgt))
    return dict(q1=q1, q2=q2, q1inv_q2=q1inv_q2, Q=Q, Qhalf=Q // 2,
                offset=offset, g_bits=g_bits, dgt=dgt)


def signed_digit_decompose_rns(params: TfheParams, c: jax.Array
                               ) -> jax.Array:
    """[..., 2, L, N] uint32 COEFF residues -> balanced base-Bg digits
    [..., dG2, N] int32 (digit 0 dropped; rows r = 2t + poly)."""
    g = _garner_consts(params)
    q1, q2 = g["q1"], g["q2"]
    x1 = c[..., 0, :]
    x2 = c[..., 1, :]
    # Garner: t = (x2 - x1) * q1^-1 mod q2;  v = x1 + q1 * t  (in [0, Q))
    diff = sub_mod(x2, x1 % u32(q2), q2)
    t = lwe.mul_mod_vec(diff, u32(g["q1inv_q2"] % q2), q2)
    hi, lo = mul32_parts(u32(q1), t)
    hi, lo = u64_add(hi, lo, u32(0), x1)
    # center: v >= Q/2 -> v -= Q (two's complement word pair)
    ge = u64_geq(hi, lo, u32(g["Qhalf"] >> 32),
                 u32(g["Qhalf"] & 0xFFFFFFFF))
    sh, sl = u64_sub(hi, lo, u32(g["Q"] >> 32), u32(g["Q"] & 0xFFFFFFFF))
    hi = jnp.where(ge, sh, hi)
    lo = jnp.where(ge, sl, lo)
    # parallel balanced digits: add offset, extract unsigned digits
    hi, lo = u64_add_const(hi, lo, g["offset"])
    bg = params.base_g
    g_bits = g["g_bits"]
    outs = []
    for tt in range(1, g["dgt"]):                # drop digit 0
        d = u64_shr(hi, lo, g_bits * tt) & u32(bg - 1)
        outs.append(d.astype(jnp.int32) - jnp.int32(bg >> 1))
    st = jnp.stack(outs, axis=-3)                # [..., dg, 2, N]
    shape = st.shape[:-3] + (2 * (g["dgt"] - 1), st.shape[-1])
    return st.reshape(shape)


def ntt_digits_rns(params: TfheParams, digits: jax.Array) -> jax.Array:
    """Signed digits [..., dG2, N] -> EVAL residues [..., dG2, L, N]."""
    plan = _plan(params)
    # reduce signed digits into each limb
    dl = []
    for l, q in enumerate(params.moduli_rns):
        v = jnp.where(digits < 0, digits + jnp.int32(q), digits)
        dl.append(v.astype(U32) % u32(q))
    stacked = jnp.stack(dl, axis=-2)             # [..., dG2, L, N]
    return rns.ntt_forward(plan, stacked)


def external_product_rns(params: TfheParams, d_eval: jax.Array,
                         bsk_rows: jax.Array) -> jax.Array:
    """sum_r d_eval[..., r, :, :] * bsk_rows[r, c, :, :] -> [..., 2, L, N].

    d_eval: [..., dG2, L, N] plain form; bsk_rows: [dG2, 2, L, N]
    Montgomery form."""
    plan = _plan(params)
    qb = plan.q_arr[:, None]
    qinv = plan.qinv_neg[:, None]
    prod = mont_mul(d_eval[..., :, None, :, :], bsk_rows, qb, qinv)
    acc = prod[..., 0, :, :, :]
    for r in range(1, prod.shape[-4]):
        acc = add_mod(acc, prod[..., r, :, :, :], qb)
    return acc


@functools.lru_cache(maxsize=None)
def _mono_sq_tables_rns(params: TfheParams) -> np.ndarray:
    """[L, logm, N] Montgomery tables of psi_l^(2^j (2k+1))."""
    N = params.N
    tabs = [boot._mono_sq_tables(N, q) for q in params.moduli_rns]
    return np.stack(tabs)                        # each [logm, N]


def _monomial_pow_rns(params: TfheParams, idx: jax.Array) -> jax.Array:
    """X^idx EVAL residues, Montgomery form: [B, L, N]."""
    N = params.N
    plan = _plan(params)
    tables = jnp.asarray(_mono_sq_tables_rns(params))   # [L, logm, N]
    logm = (2 * N).bit_length() - 1
    qb = plan.q_arr[:, None]
    qinv = plan.qinv_neg[:, None]
    r1 = np.array([(1 << 32) % q for q in params.moduli_rns],
                  dtype=np.uint32)
    w = jnp.broadcast_to(jnp.asarray(r1)[None, :, None],
                         idx.shape + (2, N)).astype(U32)
    for j in range(logm):
        bit = ((idx >> j) & u32(1))[..., None, None]
        wm = mont_mul(w, tables[:, j, :][None], qb, qinv)
        w = jnp.where(bit == 1, wm, w)
    return w


def monomial_minus_one_rns(params: TfheParams, idx: jax.Array) -> jax.Array:
    """(X^idx - 1) EVAL residues, Montgomery form: [B, L, N]."""
    plan = _plan(params)
    r1 = np.array([(1 << 32) % q for q in params.moduli_rns],
                  dtype=np.uint32)
    return sub_mod(_monomial_pow_rns(params, idx),
                   jnp.asarray(r1)[None, :, None], plan.q_arr[:, None])


def monomial_pair_rns(params: TfheParams, idx: jax.Array
                      ) -> tuple[jax.Array, jax.Array]:
    """(X^idx - 1, X^{-idx} - 1) from one exponentiation chain: the
    negative-exponent values are the eval-point flip (2(N-1-k)+1 =
    -(2k+1) mod 2N) -- see boot.monomial_pair_eval."""
    plan = _plan(params)
    r1 = jnp.asarray(np.array([(1 << 32) % q for q in params.moduli_rns],
                              dtype=np.uint32))[None, :, None]
    qb = plan.q_arr[:, None]
    w = _monomial_pow_rns(params, idx)
    return sub_mod(w, r1, qb), sub_mod(jnp.flip(w, axis=-1), r1, qb)


# ---------------------------------------------------------------------------
# bootstrap key + blind rotation
# ---------------------------------------------------------------------------

def bsk_gen_rns(params: TfheParams, sk: lwe.LweSecretKey,
                sk_n: lwe.LweSecretKey, rng: np.random.Generator
                ) -> jax.Array:
    """CGGI bootstrap key over the RNS ring:
    [n, 2, dG2, 2, L, N] uint32 (EVAL, Montgomery)."""
    mods = tuple(params.moduli_rns)
    Q = mods[0] * mods[1]
    N, n = params.N, params.n
    dg2 = params.digits_g2
    plan = _plan(params)

    a = np.stack([rng.integers(0, q, size=(n, 2, dg2, N), dtype=np.int64)
                  for q in mods], axis=-2).astype(np.uint32)
    e = lwe._sample_error(rng, (n, 2, dg2, N), params.std_dev)
    e_r = np.stack([(e % q).astype(np.uint32) for q in mods], axis=-2)
    s = np.asarray(sk.s, dtype=np.int64)
    m = np.stack([(s == 1), (s == -1)], axis=1).astype(np.uint64)  # [n, 2]

    skn = np.asarray(sk_n.s, dtype=np.int64)
    skn_r = np.stack([(skn % q).astype(np.uint32) for q in mods])

    gpow = [pow(params.base_g, (r >> 1) + 1, Q) for r in range(dg2)]
    gpow_r = np.array([[g % q for q in mods] for g in gpow],
                      dtype=np.uint32)            # [dg2, L]

    a_eval = rns.ntt_forward(plan, jnp.asarray(a))
    e_eval = rns.ntt_forward(plan, jnp.asarray(e_r))
    skn_eval = rns.ntt_forward(plan, jnp.asarray(skn_r))
    qb = plan.q_arr[:, None]
    # message term: constant poly m * gpow (same value at every eval
    # point); m is 0/1 and gpow_r < q, so uint32 products stay reduced
    msg = (jnp.asarray(m.astype(np.uint32))[:, :, None, None, None] *
           jnp.asarray(gpow_r)[None, None, :, :, None])
    row_odd = (jnp.arange(dg2, dtype=U32) & 1)[None, None, :, None, None]
    col0 = add_mod(a_eval, jnp.where(row_odd == 0, msg, 0), qb)
    # product a*skn per limb (to-Montgomery hop on skn)
    skn_mont = mont_mul(skn_eval, plan.r2[:, None], qb,
                        plan.qinv_neg[:, None])
    prod = mont_mul(a_eval, skn_mont[None, None, None], qb,
                    plan.qinv_neg[:, None])
    col1 = add_mod(e_eval, prod, qb)
    col1 = add_mod(col1, jnp.where(row_odd == 1, msg, 0), qb)
    bsk = jnp.stack([col0, col1], axis=3)        # [n, 2, dg2, 2, L, N]
    return mont_mul(bsk, plan.r2[:, None], qb, plan.qinv_neg[:, None])


def blind_rotate_rns(params: TfheParams, bsk: jax.Array, acc: jax.Array,
                     a: jax.Array) -> jax.Array:
    """CGGI accumulation over the 2-limb ring.
    bsk [n, 2, dG2, 2, L, N]; acc [B, 2, L, N] EVAL; a [B, n] mod q."""
    N, q = params.N, params.q
    plan = _plan(params)
    m_by = (2 * N) // q
    idx_pos = (jnp.where(a == 0, 0, u32(q) - a) * u32(m_by)) & u32(2 * N - 1)

    def step(carry, xs):
        acc = carry
        bsk_i, ip = xs
        c = rns.ntt_inverse(plan, acc)
        digits = signed_digit_decompose_rns(params, c)
        d_eval = ntt_digits_rns(params, digits)
        ep_pos = external_product_rns(params, d_eval, bsk_i[0])
        ep_neg = external_product_rns(params, d_eval, bsk_i[1])
        mp, mn = monomial_pair_rns(params, ip)
        mono_p = mp[:, None]                                   # [B,1,L,N]
        mono_n = mn[:, None]
        qb = plan.q_arr[:, None]
        qinv = plan.qinv_neg[:, None]
        upd = add_mod(mont_mul(ep_pos, mono_p, qb, qinv),
                      mont_mul(ep_neg, mono_n, qb, qinv), qb)
        return add_mod(acc, upd, qb), None

    acc, _ = jax.lax.scan(step, acc, (bsk, idx_pos.T))
    return acc


# ---------------------------------------------------------------------------
# gate pipeline
# ---------------------------------------------------------------------------

def _gate_test_vector_rns(params: TfheParams, b: np.ndarray,
                          gate: Gate, p: int = 4) -> jax.Array:
    """[B, L, N] COEFF residues of the gate test vector (host)."""
    N, q = params.N, params.q
    mods = params.moduli_rns
    Q = mods[0] * mods[1]
    q_half = q >> 1
    q1c = params.gate_const(gate)
    q2c = (q1c + q_half) % q
    swap = q1c >= q2c
    lb, ub = (q2c, q1c) if swap else (q1c, q2c)
    q2p = Q // (p * 2) + 1
    lv, uv = (q2p, Q - q2p) if swap else (Q - q2p, q2p)
    factor = N // q_half
    j = np.arange(q_half)
    bj = (b[:, None] - j[None, :]) % q
    vals = np.where((bj >= lb) & (bj < ub), lv, uv).astype(object)
    m = np.zeros((len(b), len(mods), N), dtype=np.uint32)
    for l, ql in enumerate(mods):
        m[:, l, ::factor] = (vals % ql).astype(np.uint32)
    return jnp.asarray(m)


def _extract_and_switch(params: TfheParams, acc: jax.Array,
                        b_offset: int, ksk, p: int) -> lwe.LweCiphertext:
    """Sample extract (host CRT via Garner in numpy uint64) + mod switch
    Q -> qKS (exact rounding in uint64) + device key switch -> mod q."""
    plan = _plan(params)
    q1, q2 = params.moduli_rns
    Q = q1 * q2
    N = params.N
    a_t = jnp.flip(acc[:, 0], axis=-1)            # a(X^{2N-1}) in EVAL
    both = jnp.stack([a_t, acc[:, 1]], axis=1)    # [B, 2, L, N]
    coef = np.asarray(rns.ntt_inverse(plan, both)).astype(np.uint64)
    x1, x2 = coef[..., 0, :], coef[..., 1, :]
    t = ((x2 + q2 - x1 % q2) % q2 * pow(q1, -1, q2)) % q2
    v = x1 + q1 * t                               # uint64 < Q < 2^63
    a_big = v[:, 0, :]                            # [B, N]
    b_big = (v[:, 1, 0] + b_offset) % Q
    # exact mod switch to qKS: round(qks * x / Q)
    qks = params.q_ks
    ms = lambda x: ((x * np.uint64(qks) + np.uint64(Q // 2)) //
                    np.uint64(Q)) % np.uint64(qks)
    ct = lwe.LweCiphertext(a=jnp.asarray(ms(a_big).astype(np.uint32)),
                           b=jnp.asarray(ms(b_big).astype(np.uint32)),
                           modulus=qks, pt_mod=p)
    ct = lwe.key_switch(params, ksk, ct)
    return lwe.mod_switch(ct, params.q)


def eval_bin_gate_rns(params: TfheParams, key, gate: Gate,
                      ct1: lwe.LweCiphertext, ct2: lwe.LweCiphertext,
                      p: int = 4) -> lwe.LweCiphertext:
    """Two-input bootstrapped gate on the 2-limb ring (the >=2^31-Q
    analogue of boot.eval_bin_gate)."""
    comb = lwe.add(ct1, ct2)
    if gate in (Gate.XOR, Gate.XNOR, Gate.XOR_FAST, Gate.XNOR_FAST):
        comb = lwe.add(comb, comb)
    Q = params.moduli_rns[0] * params.moduli_rns[1]
    b_offset = Q // (p * 2) + 1
    plan = _plan(params)
    tv = _gate_test_vector_rns(params, np.asarray(comb.b), gate, p)
    acc1 = rns.ntt_forward(plan, tv)[:, None]     # [B, 1, L, N]
    acc0 = jnp.zeros_like(acc1)
    acc = jnp.concatenate([acc0, acc1], axis=1)   # [B, 2, L, N]
    rot = jax.jit(functools.partial(blind_rotate_rns, params))(
        key.bsk, acc, comb.a)
    return _extract_and_switch(params, rot, b_offset, key.ksk, p)
