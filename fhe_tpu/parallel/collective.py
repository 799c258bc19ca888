"""Cross-device collectives for RNS FHE: the multi-chip execution layer.

The reference has no distributed backend (SURVEY §2.7: OpenMP only); its
parallel *structure* is what maps to a TPU mesh:

* RNS limbs are independent lanes (/root/reference/src/core/include/
  lattice/hal/default/dcrtpoly.h:59) and the CRT basis change
  ApproxSwitchCRTBasis (dcrtpoly-impl.h:910) is a contraction over the
  input-limb axis -> shard input limbs across chips, psum the partial
  sums (SURVEY §2.7 P5).
* The HYBRID key switch partitions the chain into dnum digits and sums
  per-digit inner products against the switching key
  (/root/reference/src/pke/lib/keyswitch/keyswitch-hybrid.cpp:328-380,
  EvalFastKeySwitchCore) -> shard the digit axis, each chip ModUps and
  multiplies its own digits, one psum produces the switched pair.
* Multiparty decryption fusion sums party shares
  (rns-multiparty.cpp:45-164) -> shard the party axis, fuse with psum
  (SURVEY §2.7 P6).

All collectives are EXACT: uint32 residues are summed as split 16-bit
halves (no wraparound up to 2^15 devices) and recombined mod q, so the
sharded paths are bit-identical to the single-device ones.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..lattice import rns
from ..lattice.rns import RnsPoly, COEFF, EVAL, make_rns_plan
from ..math.modmath import (U32, u32, add_mod, mont_mul, shoup_mul,
                            barrett_reduce_u32)

_MASK16 = u32(0xFFFF)


# ---------------------------------------------------------------------------
# exact modular psum
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _psum_consts(moduli: tuple):
    """Per-limb constants for psum_mod: 2^16 mod q (+ Shoup dual) and the
    Barrett mu = floor(2^32/q)."""
    w16 = np.array([(1 << 16) % q for q in moduli], dtype=np.uint32)
    w16_s = np.array([((1 << 16) % q << 32) // q for q in moduli],
                     dtype=np.uint32)
    mu = np.array([(1 << 32) // q for q in moduli], dtype=np.uint32)
    return w16, w16_s, mu


def psum_mod(x: jax.Array, moduli: tuple, axis_name: str) -> jax.Array:
    """Exact sum mod q_l of per-device uint32 residues [..., L, N] across a
    mesh axis.

    A raw integer psum would wrap mod 2^32 (residues are < 2^31); instead
    the 16-bit halves are psummed separately (each half-sum stays < 2^31
    for any axis size < 2^15) and recombined as (hi*2^16 + lo) mod q with
    one Shoup multiply + one Barrett reduction -- bit-exact, two psums."""
    w16_np, w16_s_np, mu_np = _psum_consts(tuple(int(q) for q in moduli))
    q = jnp.asarray(np.array(moduli, dtype=np.uint32))[:, None]
    w16 = jnp.asarray(w16_np)[:, None]
    w16_s = jnp.asarray(w16_s_np)[:, None]
    mu = jnp.asarray(mu_np)[:, None]
    lo = jax.lax.psum(x & _MASK16, axis_name)
    hi = jax.lax.psum(x >> 16, axis_name)
    t = shoup_mul(hi, w16, w16_s, q)          # hi * 2^16 mod q, in [0, q)
    r = barrett_reduce_u32(lo, q, mu)         # lo mod q
    return add_mod(t, r, q)


def psum_mod_pow2(x: jax.Array, q: int, axis_name: str) -> jax.Array:
    """Exact sum mod a power-of-two q (TFHE/LWE moduli): uint32 wraparound
    is already exact mod q | 2^32."""
    assert q & (q - 1) == 0
    return jax.lax.psum(x, axis_name) & u32(q - 1)


# ---------------------------------------------------------------------------
# P5: limb-sharded ApproxSwitchCRTBasis
# ---------------------------------------------------------------------------

def _pad_axis(x: np.ndarray, axis: int, to: int) -> np.ndarray:
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, to - x.shape[axis])
    return np.pad(x, pad)


def switch_crt_basis_approx_sharded(p: RnsPoly, to_mods: tuple,
                                    mesh: Mesh, axis: str) -> RnsPoly:
    """ApproxSwitchCRTBasis with the INPUT limb axis sharded over `axis`:
    out_j = sum_i [x_i qhatinv_i]_{q_i} * qhat_ij mod p_j.  Each device
    contracts its own limbs against its slice of the (Q/q_i mod p_j)
    matrix; one psum_mod yields the full output on every device.

    Bit-exact vs rns.switch_crt_basis_approx (tested)."""
    assert p.fmt == COEFF
    n_dev = mesh.shape[axis]
    L, N = p.L, p.N
    Lp = -(-L // n_dev) * n_dev
    qhat_inv_np, qhat_to_np = rns._basis_consts(p.moduli, tuple(to_mods))
    # pad limb axis; padded limbs get qhatinv=0 => y=0 => contribute 0
    q_arr = _pad_axis(np.array(p.moduli, np.uint32), 0, Lp)
    q_arr[L:] = 3  # dummy odd modulus for padded lanes (values stay 0)
    qinv_neg = np.zeros(Lp, np.uint32)
    for i, q in enumerate(q_arr):
        qinv_neg[i] = (-pow(int(q), -1, 1 << 32)) % (1 << 32)
    qhat_inv = _pad_axis(qhat_inv_np, 0, Lp)
    qhat_to = _pad_axis(qhat_to_np, 0, Lp)
    x = jnp.concatenate(
        [p.data, jnp.zeros((Lp - L, N), jnp.uint32)], axis=0)

    to_plan = make_rns_plan(N, tuple(to_mods))
    pq = to_plan.q_arr[:, None]
    pinv = to_plan.qinv_neg[:, None]

    def body(x_l, qhi, qto, qa, qn):
        # x_l: [Lp/n, N] local limbs
        y = mont_mul(x_l, qhi[:, None], qa[:, None], qn[:, None])
        terms = mont_mul(y[:, None, :], qto[:, :, None], pq, pinv)
        acc = terms[0]
        for i in range(1, terms.shape[0]):
            acc = add_mod(acc, terms[i], pq)
        return psum_mod(acc, tuple(to_mods), axis)

    out = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P())(
            x, jnp.asarray(qhat_inv), jnp.asarray(qhat_to),
            jnp.asarray(q_arr), jnp.asarray(qinv_neg))
    return RnsPoly(out, tuple(to_mods), COEFF)


# ---------------------------------------------------------------------------
# digit-uniform HYBRID key switch (stacked constants; shardable dnum axis)
# ---------------------------------------------------------------------------

def _digit_consts(q_mods: tuple, p_mods: tuple, npp: int):
    """Stacked per-digit ModUp constants -- shared with the single-device
    fused key switch (pke.rlwe._digit_consts)."""
    from ..pke.rlwe import _digit_consts as dc
    return dc(q_mods, p_mods, npp)


def _modup_digit(x_ext, qhi, qto, mask, q_plan, ext_plan):
    """One digit's ApproxModUp on COEFF data, digit-uniform form.

    x_ext: [M, N] COEFF input over QP (P limbs zero); qhi: [L] Mont
    qhat_inv (zero outside the digit); qto: [L, M]; mask: [M] exact-limb
    selector.  Returns [M, N] COEFF."""
    L = len(q_plan.moduli)
    x_q = x_ext[:L]
    y = mont_mul(x_q, qhi[:, None], q_plan.q_arr[:, None],
                 q_plan.qinv_neg[:, None])                     # [L, N]
    eq = ext_plan.q_arr[:, None]
    einv = ext_plan.qinv_neg[:, None]
    terms = mont_mul(y[:, None, :], qto[:, :, None], eq, einv)  # [L, M, N]
    acc = terms[0]
    for i in range(1, terms.shape[0]):
        acc = add_mod(acc, terms[i], eq)
    return jnp.where(mask[:, None].astype(bool), x_ext, acc)


def key_switch_sharded(params, evk, c: RnsPoly, mesh: Mesh,
                       axis: str = "digit") -> tuple[RnsPoly, RnsPoly]:
    """HYBRID key switch with the DIGIT axis sharded across the mesh: the
    TPU-native form of EvalFastKeySwitchCore's digit sum
    (keyswitch-hybrid.cpp:322-380) as a cross-chip reduction.

    Each device ModUps its own digits of c onto Q_l+P, NTTs them, and
    multiplies against its shard of the switching key; one exact modular
    psum over the digit axis yields (d0, d1) over the extended basis, and
    the P-removal ModDown runs replicated.  Bit-exact vs rlwe.key_switch.
    """
    from ..pke import rlwe
    q_mods = c.moduli
    L = len(q_mods)
    p_mods = tuple(params.special_mods)
    ext_mods = tuple(q_mods) + p_mods
    M = len(ext_mods)
    npp = params.num_per_part
    dnum = -(-L // npp)
    n_dev = mesh.shape[axis]
    dpad = -(-dnum // n_dev) * n_dev
    N = c.N

    qhatinv_np, qhat_to_np, exact_np = _digit_consts(
        tuple(q_mods), p_mods, npp)
    qhatinv = jnp.asarray(_pad_axis(qhatinv_np, 0, dpad))
    qhat_to = jnp.asarray(_pad_axis(qhat_to_np, 0, dpad))
    exact = jnp.asarray(_pad_axis(exact_np, 0, dpad))

    # evk digits over the FULL QP basis -> select the Q_l + P limbs;
    # pad the digit axis with zeros (padded digits contribute 0).
    idx = jnp.asarray([evk.moduli_qp.index(q) for q in ext_mods])
    evb = jnp.take(evk.b, idx, axis=1)[:dnum]
    eva = jnp.take(evk.a, idx, axis=1)[:dnum]
    if dpad > dnum:
        z = jnp.zeros((dpad - dnum,) + evb.shape[1:], jnp.uint32)
        evb = jnp.concatenate([evb, z], axis=0)
        eva = jnp.concatenate([eva, z], axis=0)

    c_coeff = rns.to_coeff(c)
    x_ext = jnp.concatenate(
        [c_coeff.data, jnp.zeros((len(p_mods), N), jnp.uint32)], axis=0)

    q_plan = make_rns_plan(N, tuple(q_mods))
    ext_plan = make_rns_plan(N, ext_mods)
    eq = ext_plan.q_arr[:, None]
    einv = ext_plan.qinv_neg[:, None]
    r2 = ext_plan.r2[:, None]

    def body(x, qhi, qto, msk, eb, ea):
        d0 = jnp.zeros((M, N), U32)
        d1 = jnp.zeros((M, N), U32)
        for d in range(qhi.shape[0]):       # static local-digit count
            up = _modup_digit(x, qhi[d], qto[d], msk[d], q_plan, ext_plan)
            up = rns.ntt_forward(ext_plan, up)
            bm = mont_mul(eb[d], r2, eq, einv)
            am = mont_mul(ea[d], r2, eq, einv)
            d0 = add_mod(d0, mont_mul(up, bm, eq, einv), eq)
            d1 = add_mod(d1, mont_mul(up, am, eq, einv), eq)
        return (psum_mod(d0, ext_mods, axis), psum_mod(d1, ext_mods, axis))

    d0, d1 = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()))(x_ext, qhatinv, qhat_to, exact, evb, eva)

    d0p = RnsPoly(d0, ext_mods, EVAL)
    d1p = RnsPoly(d1, ext_mods, EVAL)
    return (rlwe.key_switch_down_poly(params, d0p),
            rlwe.key_switch_down_poly(params, d1p))


# ---------------------------------------------------------------------------
# P6: multiparty fusion as a party-axis collective
# ---------------------------------------------------------------------------

def fuse_sharded(shares_data: jax.Array, moduli: tuple, mesh: Mesh,
                 axis: str = "party") -> RnsPoly:
    """MultipartyDecryptFusion (rns-multiparty.cpp fusion semantics) as a
    cross-device collective: party shares stacked [n_parties, L, N] (EVAL)
    and sharded over the party axis; one exact psum_mod fuses them.

    Across hosts the same program runs over a DCN-spanning mesh -- the
    collective is the transport."""
    n_dev = mesh.shape[axis]
    n_parties = shares_data.shape[0]
    npad = -(-n_parties // n_dev) * n_dev
    if npad > n_parties:
        z = jnp.zeros((npad - n_parties,) + shares_data.shape[1:],
                      jnp.uint32)
        shares_data = jnp.concatenate([shares_data, z], axis=0)

    def body(local):
        acc = local[0]
        q = make_rns_plan(local.shape[-1], moduli).q_arr[:, None]
        for i in range(1, local.shape[0]):
            acc = add_mod(acc, local[i], q)
        return psum_mod(acc, moduli, axis)

    out = jax.shard_map(body, mesh=mesh, in_specs=P(axis),
                        out_specs=P())(shares_data)
    return rns.to_coeff(RnsPoly(out, tuple(moduli), EVAL))


def threshold_combine_sharded(partials: jax.Array, q: int, mesh: Mesh,
                              axis: str = "party") -> jax.Array:
    """TFHE threshold combine (batch_threshold.h Lagrange-combine stage)
    over a party-sharded mesh: partial decryptions [n_parties, ...] mod a
    power-of-two LWE q, combined with one wrapping psum (exact, q | 2^32).
    """
    n_dev = mesh.shape[axis]
    n_parties = partials.shape[0]
    npad = -(-n_parties // n_dev) * n_dev
    if npad > n_parties:
        z = jnp.zeros((npad - n_parties,) + partials.shape[1:], jnp.uint32)
        partials = jnp.concatenate([partials, z], axis=0)

    def body(local):
        return psum_mod_pow2(jnp.sum(local, axis=0, dtype=U32) & u32(q - 1),
                             q, axis)

    return jax.shard_map(body, mesh=mesh, in_specs=P(axis),
                         out_specs=P())(partials)
