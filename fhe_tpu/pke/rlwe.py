"""RLWE core shared by the RNS schemes: keys, encryption, HYBRID key
switching.

Reference semantics: /root/reference/src/pke/lib/keyswitch/
keyswitch-hybrid.cpp (KeySwitchGenInternal:48-137 -- per-limb P*sOld
injection inside each digit's limb range; KeySwitchCore:322,
EvalKeySwitchPrecomputeCore:328-380 -- partition + ApproxModUp;
EvalFastKeySwitchCore -- inner products over QP then ApproxModDown), and
base-pke encrypt conventions (c0 = b*u + e0 + m, c1 = a*u + e1 for public
key (b, a) with b = -a*s + e).

TPU re-architecture: every digit's inner product is one batched pointwise
Montgomery multiply-accumulate over stacked [dnum, L_qp, N] tensors; the
limb axis is the natural sharding axis for multi-chip key switching
(SURVEY SS2.7 P5).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..lattice import rns
from ..lattice.rns import RnsPoly, COEFF, EVAL


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SecretKey:
    """Ternary secret as signed ints [N] (host) + EVAL residues on the full
    chain (device); sub-chains are sliced from the full representation."""
    s_signed: jax.Array           # [N] int32, in {-1,0,1}
    s_eval_full: jax.Array        # [L_full, N] uint32 EVAL over moduli_full
    moduli_full: tuple = dataclasses.field(metadata=dict(static=True))

    def eval_poly(self, moduli: tuple) -> RnsPoly:
        idx = [self.moduli_full.index(q) for q in moduli]
        return RnsPoly(self.s_eval_full[list(idx), :], tuple(moduli), EVAL)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PublicKey:
    b: RnsPoly    # -a*s + e   (EVAL, over Q)
    a: RnsPoly


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EvalKey:
    """HYBRID switching key: for each digit d, (b_d, a_d) over QP (EVAL).

    b: [dnum, L_qp, N] uint32; a: [dnum, L_qp, N] uint32."""
    b: jax.Array
    a: jax.Array
    moduli_qp: tuple = dataclasses.field(metadata=dict(static=True))
    num_per_part: int = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BvEvalKey:
    """BV (digit-decomposition) switching key
    (keyswitch-bv.cpp:48-137): one (b, a) RLWE pair over the FULL chain
    per key row; row (i, k) encrypts B^k * s_old_i placed on limb i only
    (PowersOfBase + per-tower filtering).

    b/a: [n_rows, L, N] uint32 EVAL; digit_bits = 0 means per-tower-only
    decomposition (relinWindow 0)."""
    b: jax.Array
    a: jax.Array
    moduli: tuple = dataclasses.field(metadata=dict(static=True))
    digit_bits: int = dataclasses.field(metadata=dict(static=True))
    rows_per_limb: tuple = dataclasses.field(metadata=dict(static=True))


def sample_ternary(rng: np.random.Generator, N: int,
                   h: int | None = None) -> np.ndarray:
    """Uniform ternary secret, or sparse ternary with Hamming weight h
    (the reference's SPARSE_TERNARY secret distribution used by CKKS
    bootstrapping to keep the sine-approximation range K small)."""
    if h is None:
        return rng.integers(-1, 2, size=N, dtype=np.int64)
    assert 0 < h <= N
    s = np.zeros(N, dtype=np.int64)
    idx = rng.choice(N, size=h, replace=False)
    s[idx] = rng.choice(np.array([-1, 1], dtype=np.int64), size=h)
    return s


def sample_gauss(rng: np.random.Generator, N: int, std: float) -> np.ndarray:
    return np.rint(rng.normal(0.0, std, size=N)).astype(np.int64)


def signed_to_rns(v: np.ndarray, moduli: tuple, fmt=COEFF) -> RnsPoly:
    limbs = np.stack([(v % q).astype(np.uint32) for q in moduli], axis=-2)
    return RnsPoly(jnp.asarray(limbs), tuple(moduli), fmt)


def keygen(params, rng: np.random.Generator,
           h: int | None = None) -> SecretKey:
    all_mods = tuple(params.moduli) + tuple(params.special_mods)
    s = sample_ternary(rng, params.N, h)
    sp = rns.to_eval(signed_to_rns(s, all_mods))
    return SecretKey(s_signed=jnp.asarray(s.astype(np.int32)),
                     s_eval_full=sp.data, moduli_full=all_mods)


def pubkey_gen(params, sk: SecretKey, rng: np.random.Generator,
               noise_scale: int = 1) -> PublicKey:
    mods = tuple(params.moduli)
    a = uniform_poly(rng, mods, params.N)
    e = rns.to_eval(signed_to_rns(
        noise_scale * sample_gauss(rng, params.N, params.std_dev), mods))
    s = sk.eval_poly(mods)
    b = rns.add(rns.neg(rns.mul(a, s)), e)
    return PublicKey(b=b, a=a)


def uniform_poly(rng: np.random.Generator, moduli: tuple, N: int,
                 fmt=EVAL) -> RnsPoly:
    limbs = np.stack([rng.integers(0, q, size=N, dtype=np.int64)
                      for q in moduli], axis=-2).astype(np.uint32)
    return RnsPoly(jnp.asarray(limbs), tuple(moduli), fmt)


def encrypt_pk(params, pk: PublicKey, m: RnsPoly, rng: np.random.Generator,
               noise_scale: int = 1) -> tuple[RnsPoly, RnsPoly]:
    """(c0, c1) = (b*u + ns*e0 + m, a*u + ns*e1); m in EVAL over pk's basis."""
    mods = pk.b.moduli
    N = params.N
    u = rns.to_eval(signed_to_rns(sample_ternary(rng, N), mods))
    e0 = rns.to_eval(signed_to_rns(
        noise_scale * sample_gauss(rng, N, params.std_dev), mods))
    e1 = rns.to_eval(signed_to_rns(
        noise_scale * sample_gauss(rng, N, params.std_dev), mods))
    c0 = rns.add(rns.add(rns.mul(pk.b, u), e0), m)
    c1 = rns.add(rns.mul(pk.a, u), e1)
    return c0, c1


def encrypt_sk(params, sk: SecretKey, m: RnsPoly, rng: np.random.Generator,
               noise_scale: int = 1) -> tuple[RnsPoly, RnsPoly]:
    mods = m.moduli
    a = uniform_poly(rng, mods, params.N)
    e = rns.to_eval(signed_to_rns(
        noise_scale * sample_gauss(rng, params.N, params.std_dev), mods))
    s = sk.eval_poly(mods)
    c0 = rns.add(rns.add(rns.neg(rns.mul(a, s)), e), m)
    return c0, a


def decrypt_phase(sk: SecretKey, c0: RnsPoly, c1: RnsPoly) -> RnsPoly:
    """m + e = c0 + c1*s (EVAL in, COEFF out)."""
    s = sk.eval_poly(c0.moduli)
    return rns.to_coeff(rns.add(c0, rns.mul(c1, s)))


# ---------------------------------------------------------------------------
# HYBRID key switching
# ---------------------------------------------------------------------------

def _p_mod_q(p_mods: tuple, q_mods: tuple) -> np.ndarray:
    P = 1
    for p in p_mods:
        P *= p
    return np.array([P % q for q in q_mods], dtype=np.uint32)


def evk_gen(params, s_old: RnsPoly, sk_new: SecretKey,
            rng: np.random.Generator, noise_scale: int = 1,
            a_common: jax.Array | None = None) -> EvalKey:
    """Switching key s_old -> sk_new (keyswitch-hybrid.cpp:48-137).

    s_old: EVAL poly over the full Q chain (e.g. s^2 for relin, s(X^k) for
    rotations).

    a_common: optional [dnum, L_qp, N] stack of `a` digits to reuse instead
    of sampling fresh ones — the multiparty joint-evalkey protocol
    (base-multiparty.cpp MultiKeySwitchGen) requires every party's share
    to ride the SAME uniform digits so the b components sum."""
    q_mods = tuple(params.moduli)
    p_mods = tuple(params.special_mods)
    qp = q_mods + p_mods
    L, n_digits = len(q_mods), params.num_part_q
    npp = params.num_per_part
    N = params.N

    s_new = sk_new.eval_poly(qp)
    pmodq = _p_mod_q(p_mods, qp)   # P mod each qp limb (0-ish on P limbs)

    bs, as_ = [], []
    for d in range(n_digits):
        if a_common is not None:
            a = RnsPoly(a_common[d], qp, EVAL)
        else:
            a = uniform_poly(rng, qp, N)
        e = rns.to_eval(signed_to_rns(
            noise_scale * sample_gauss(rng, N, params.std_dev), qp))
        b = rns.add(rns.neg(rns.mul(a, s_new)), e)
        lo, hi = d * npp, min((d + 1) * npp, L)
        if lo < L:
            # add P * s_old on limbs [lo, hi) only
            mask = np.zeros(len(qp), dtype=np.uint32)
            mask[lo:hi] = 1
            sel = jnp.asarray(pmodq * mask)
            # s_old is over Q; extend its limb data onto QP by placing its
            # residues (only limbs in [lo,hi) matter, all < L)
            s_old_ext = jnp.zeros((len(qp), N), dtype=jnp.uint32)
            s_old_ext = s_old_ext.at[:L].set(s_old.data)
            term = rns.mul_scalar(RnsPoly(s_old_ext, qp, EVAL), sel)
            b = rns.add(b, term)
        bs.append(b.data)
        as_.append(a.data)
    return EvalKey(b=jnp.stack(bs), a=jnp.stack(as_), moduli_qp=qp,
                   num_per_part=npp)


def key_switch_precompute(params, c: RnsPoly) -> list[RnsPoly]:
    """Rotation-independent half of the HYBRID key switch
    (EvalKeySwitchPrecomputeCore, keyswitch-hybrid.cpp:328-380; the
    hoisting behind EvalFastRotationPrecompute): digit decomposition
    (RNS limb slicing) + ApproxModUp of each digit onto Q_l + P, returned
    in EVAL format.  Automorphisms act on EVAL polys as pure evaluation-
    point permutations, so one precompute serves every rotation index."""
    q_mods = c.moduli
    L = len(q_mods)
    p_mods = tuple(params.special_mods)
    ext_mods = q_mods + p_mods
    npp = params.num_per_part
    n_digits = -(-L // npp)
    c_coeff = rns.to_coeff(c)
    ups = []
    for d in range(n_digits):
        lo, hi = d * npp, min((d + 1) * npp, L)
        part = RnsPoly(c_coeff.data[..., lo:hi, :], q_mods[lo:hi], COEFF)
        # ModUp part -> Q_l + P
        up = rns.switch_crt_basis_approx(part, ext_mods)
        # overwrite the exact limbs we already have
        up_data = up.data.at[..., lo:hi, :].set(c_coeff.data[..., lo:hi, :])
        ups.append(rns.to_eval(RnsPoly(up_data, ext_mods, COEFF)))
    return ups


def key_switch_inner(params, evk: EvalKey, ups: list[RnsPoly]
                     ) -> tuple[RnsPoly, RnsPoly]:
    """The inner-product half of EvalFastKeySwitchCore
    (EvalFastKeySwitchCoreExt, keyswitch-hybrid.cpp): digit sums against
    the switching key, returned over the EXTENDED basis Q_l + P (the
    result carries an implicit factor P).  Partial sums of many key
    switches (e.g. the BSGS inner loop of bootstrapping) can be
    accumulated here and ModDown'd ONCE via key_switch_down."""
    ext_mods = ups[0].moduli
    d0 = None
    d1 = None
    for d, up in enumerate(ups):
        # select evk limbs matching Q_l + P from the full QP layout
        idx = [evk.moduli_qp.index(q) for q in ext_mods]
        bd = evk.b[d][jnp.asarray(idx), :]
        ad = evk.a[d][jnp.asarray(idx), :]
        t0 = rns.mul(up, RnsPoly(bd, ext_mods, EVAL))
        t1 = rns.mul(up, RnsPoly(ad, ext_mods, EVAL))
        d0 = t0 if d0 is None else rns.add(d0, t0)
        d1 = t1 if d1 is None else rns.add(d1, t1)
    return d0, d1


def key_switch_down_poly(params, c: RnsPoly) -> RnsPoly:
    """KeySwitchDown for one component: ModDown by P (divide out the
    implicit P factor of key_switch_inner results)."""
    p_mods = tuple(params.special_mods)
    q_mods = c.moduli[:len(c.moduli) - len(p_mods)]
    t = params.plain_mod if params.scheme == "BGV" else None
    return rns.to_eval(rns.approx_mod_down(rns.to_coeff(c), q_mods,
                                           p_mods, t))


def key_switch_ext_poly(params, c: RnsPoly) -> RnsPoly:
    """KeySwitchExt for one component: represent P*c over the extended
    basis Q_l + P.  (P*c) mod p_j = 0 and (P*c) mod q_i = (P mod q_i)*c_i,
    so no basis conversion is needed — scale the Q limbs and zero-extend."""
    p_mods = tuple(params.special_mods)
    q_mods = c.moduli
    ext_mods = q_mods + p_mods
    pmodq = _p_mod_q(p_mods, q_mods)
    scaled = rns.mul_scalar(c, jnp.asarray(pmodq))
    zeros = jnp.zeros(c.data.shape[:-2] + (len(p_mods), c.data.shape[-1]),
                      dtype=jnp.uint32)
    data = jnp.concatenate([scaled.data, zeros], axis=-2)
    return RnsPoly(data, ext_mods, c.fmt)


def key_switch_apply(params, evk: EvalKey, ups: list[RnsPoly]
                     ) -> tuple[RnsPoly, RnsPoly]:
    """Inner products with the switching key + ModDown
    (EvalFastKeySwitchCore over precomputed digits)."""
    d0, d1 = key_switch_inner(params, evk, ups)
    return (key_switch_down_poly(params, d0),
            key_switch_down_poly(params, d1))


def key_switch(params, evk, c: RnsPoly) -> tuple[RnsPoly, RnsPoly]:
    """Apply a key switch to poly c over (possibly truncated) basis Q_l,
    dispatching on the key type: HYBRID (KeySwitchCore /
    EvalFastKeySwitchCore) or BV (keyswitch-bv.cpp KeySwitchCore).

    Returns (d0, d1) over c's basis with d0 + d1*s_new = c*s_old + noise.
    """
    if isinstance(evk, BvEvalKey):
        return bv_key_switch(params, evk, c)
    return key_switch_fused(params, evk, c)


@functools.lru_cache(maxsize=None)
def _digit_consts(q_mods: tuple, p_mods: tuple, npp: int):
    """Stacked per-digit ModUp constants so all dnum digits run ONE
    uniform tensor program (EvalKeySwitchPrecomputeCore semantics,
    keyswitch-hybrid.cpp:328-380): qhatinv[d, i] Montgomery form, zero
    outside digit d's limb range; qhat_to[d, i, j] over the Q_l+P basis;
    exact[d, j] marks the limbs the digit owns verbatim."""
    L = len(q_mods)
    ext = tuple(q_mods) + tuple(p_mods)
    M = len(ext)
    dnum = -(-L // npp)
    qhatinv = np.zeros((dnum, L), dtype=np.uint32)
    qhat_to = np.zeros((dnum, L, M), dtype=np.uint32)
    exact = np.zeros((dnum, M), dtype=np.uint32)
    for d in range(dnum):
        lo, hi = d * npp, min((d + 1) * npp, L)
        Qd = 1
        for i in range(lo, hi):
            Qd *= q_mods[i]
        for i in range(lo, hi):
            qi = q_mods[i]
            qhat = Qd // qi
            qhatinv[d, i] = (pow(qhat % qi, -1, qi) << 32) % qi
            for j, mj in enumerate(ext):
                qhat_to[d, i, j] = ((qhat % mj) << 32) % mj
        exact[d, lo:hi] = 1
    return qhatinv, qhat_to, exact


def key_switch_fused(params, evk: EvalKey, c: RnsPoly
                     ) -> tuple[RnsPoly, RnsPoly]:
    """KeySwitchCore with all digits stacked into uniform tensors: one
    batched ModUp [dnum, L_ext, N], ONE forward NTT over all digits, the
    digit inner products as a batched multiply + modular digit-sum, and
    BOTH components ModDown'd in one batched call.  Bit-exact vs the
    per-digit key_switch_precompute/key_switch_apply pipeline (tested);
    ~25% less device time at N=2^14 (fewer op dispatches, fused XLA)."""
    from ..math.modmath import mont_mul, add_mod
    q_mods = c.moduli
    L = len(q_mods)
    p_mods = tuple(params.special_mods)
    ext_mods = tuple(q_mods) + p_mods
    M = len(ext_mods)
    npp = params.num_per_part
    dnum = -(-L // npp)
    N = c.N

    qhatinv_np, qhat_to_np, exact_np = _digit_consts(tuple(q_mods), p_mods,
                                                     npp)
    # compact to each digit's own limb window [dnum, npp] (padded tail):
    # the dense [dnum, L] form wastes (dnum-1)/dnum of the multiplies
    Lp = dnum * npp
    qhi_c = np.zeros((dnum, npp), np.uint32)
    qto_c = np.zeros((dnum, npp, M), np.uint32)
    qarr_c = np.full((dnum, npp), 3, np.uint32)   # dummy odd mod for pads
    qinv_c = np.zeros((dnum, npp), np.uint32)
    for d in range(dnum):
        lo, hi = d * npp, min((d + 1) * npp, L)
        w = hi - lo
        qhi_c[d, :w] = qhatinv_np[d, lo:hi]
        qto_c[d, :w] = qhat_to_np[d, lo:hi]
        qarr_c[d, :w] = np.array(q_mods[lo:hi], np.uint32)
        for t in range(npp):
            qinv_c[d, t] = (-pow(int(qarr_c[d, t]), -1, 1 << 32)) % (1 << 32)
    exact = jnp.asarray(exact_np)

    ext_plan = rns.make_rns_plan(N, ext_mods)

    # inner products against the key digits (over the Q_l + P limbs)
    idx = jnp.asarray([evk.moduli_qp.index(q) for q in ext_mods])
    evb = jnp.take(evk.b, idx, axis=1)[:dnum]                # [dnum, M, N]
    eva = jnp.take(evk.a, idx, axis=1)[:dnum]

    def _core(x):                                            # x: [L, N]
        xp = jnp.concatenate(
            [x, jnp.zeros((Lp - L, N), jnp.uint32)], axis=0
        ).reshape(dnum, npp, N) if Lp != L else x.reshape(dnum, npp, N)
        # y[d, t] = x_{d*npp+t} * qhatinv (digit's own limbs only)
        y = mont_mul(xp, jnp.asarray(qhi_c)[:, :, None],
                     jnp.asarray(qarr_c)[:, :, None],
                     jnp.asarray(qinv_c)[:, :, None])        # [dnum, npp, N]
        eq = ext_plan.q_arr[:, None]
        einv = ext_plan.qinv_neg[:, None]
        terms = mont_mul(y[:, :, None, :], jnp.asarray(qto_c)[:, :, :, None],
                         eq, einv)                           # [dnum,npp,M,N]
        acc = terms[:, 0]
        for i in range(1, npp):
            acc = add_mod(acc, terms[:, i], eq)              # [dnum, M, N]
        x_ext = jnp.concatenate(
            [x, jnp.zeros((len(p_mods), N), jnp.uint32)], axis=0)
        ups = jnp.where(exact[:, :, None].astype(bool), x_ext[None], acc)
        ups = rns.ntt_forward(ext_plan, ups)                 # [dnum, M, N]

        r2 = ext_plan.r2[:, None]
        bm = mont_mul(evb, r2[None], eq[None], einv[None])
        am = mont_mul(eva, r2[None], eq[None], einv[None])
        t0 = mont_mul(ups, bm, eq[None], einv[None])
        t1 = mont_mul(ups, am, eq[None], einv[None])
        d0 = t0[0]
        d1 = t1[0]
        for d in range(1, dnum):
            d0 = add_mod(d0, t0[d], eq)
            d1 = add_mod(d1, t1[d], eq)

        # ONE batched ModDown for both components
        both = rns.RnsPoly(jnp.stack([d0, d1]), ext_mods, EVAL)
        t = params.plain_mod if params.scheme == "BGV" else None
        down = rns.to_eval(rns.approx_mod_down(rns.to_coeff(both),
                                               tuple(q_mods), p_mods, t))
        return down.data[0], down.data[1]

    c_coeff = rns.to_coeff(c)
    x = c_coeff.data                                         # [..., L, N]
    if x.ndim > 2:
        lead = x.shape[:-2]
        fn = _core
        for _ in lead:
            fn = jax.vmap(fn)
        d0, d1 = fn(x)
    else:
        d0, d1 = _core(x)
    return (RnsPoly(d0, tuple(q_mods), EVAL),
            RnsPoly(d1, tuple(q_mods), EVAL))


# ---------------------------------------------------------------------------
# BV key switching (digit decomposition; keyswitch-bv.cpp:48-336)
# ---------------------------------------------------------------------------

def _bv_windows(moduli: tuple, digit_bits: int) -> tuple:
    """Windows per limb: ceil(bits(q_i)/w), or 1 when digit_bits == 0."""
    if digit_bits == 0:
        return tuple(1 for _ in moduli)
    return tuple(-(-q.bit_length() // digit_bits) for q in moduli)


def bv_evk_gen(params, s_old: RnsPoly, sk_new: SecretKey,
               rng: np.random.Generator, digit_bits: int = 0,
               noise_scale: int = 1) -> BvEvalKey:
    """BV switching key s_old -> sk_new (KeySwitchGenInternal,
    keyswitch-bv.cpp:50-123): row (i, k) has b = filtered - (a*s_new +
    ns*e) with filtered = B^k * s_old_i on limb i, zero elsewhere."""
    q_mods = tuple(params.moduli)
    L = len(q_mods)
    N = params.N
    s_new = sk_new.eval_poly(q_mods)
    wins = _bv_windows(q_mods, digit_bits)
    bs, as_ = [], []
    for i, qi in enumerate(q_mods):
        s_i = s_old.data[i]                      # [N] EVAL residues mod q_i
        for k in range(wins[i]):
            a = uniform_poly(rng, q_mods, N)
            e = rns.to_eval(signed_to_rns(
                noise_scale * sample_gauss(rng, N, params.std_dev), q_mods))
            b = rns.add(rns.neg(rns.mul(a, s_new)), e)
            pw = pow(2, digit_bits * k, int(qi)) if digit_bits else 1
            filt = jnp.zeros((L, N), dtype=jnp.uint32)
            val = rns.mul_scalar(
                RnsPoly(s_i[None, :], (qi,), EVAL), pw).data[0]
            filt = filt.at[i].set(val)
            b = rns.add(b, RnsPoly(filt, q_mods, EVAL))
            bs.append(b.data)
            as_.append(a.data)
    return BvEvalKey(b=jnp.stack(bs), a=jnp.stack(as_), moduli=q_mods,
                     digit_bits=digit_bits, rows_per_limb=wins)


def bv_decompose(params, evk: BvEvalKey, c: RnsPoly) -> list[RnsPoly]:
    """CRTDecompose (EvalKeySwitchPrecomputeCore, keyswitch-bv.cpp:304):
    per-limb (optionally base-2^w digit) decomposition of c, each digit
    re-embedded over c's full basis and returned in EVAL format."""
    from ..math.modmath import barrett_reduce_u32
    q_mods = c.moduli
    L = len(q_mods)
    w = evk.digit_bits
    plan = c.plan
    c_coeff = rns.to_coeff(c)
    mu = np.array([(1 << 32) // q for q in q_mods], dtype=np.uint32)
    mu_j = jnp.asarray(mu)[:, None]
    q_j = plan.q_arr[:, None]
    digits = []
    for i, qi in enumerate(q_mods):
        x_i = c_coeff.data[..., i, :]            # [..., N] values < q_i
        wins = evk.rows_per_limb[i]
        for k in range(wins):
            if w == 0:
                d = x_i
            else:
                d = (x_i >> (w * k)) & np.uint32((1 << w) - 1)
            # embed the small digit over every limb (reduce mod q_j)
            emb = barrett_reduce_u32(
                jnp.broadcast_to(d[..., None, :],
                                 d.shape[:-1] + (L, d.shape[-1])),
                q_j, mu_j)
            digits.append(rns.to_eval(RnsPoly(emb, q_mods, COEFF)))
    return digits


def bv_key_switch(params, evk: BvEvalKey, c: RnsPoly
                  ) -> tuple[RnsPoly, RnsPoly]:
    """BV KeySwitchCore (keyswitch-bv.cpp:298-336): digit MACs against
    the key rows, keys truncated to c's basis (DropLastElements)."""
    q_mods = c.moduli
    L = len(q_mods)
    idx = [evk.moduli.index(q) for q in q_mods]
    assert idx == list(range(L)), "ciphertext basis must be a chain prefix"
    digits = bv_decompose(params, evk, c)
    row = 0
    d0 = None
    d1 = None
    for i in range(len(evk.rows_per_limb)):
        if i >= L:
            break
        for _k in range(evk.rows_per_limb[i]):
            dig = digits[row]
            b_r = RnsPoly(evk.b[row, :L], q_mods, EVAL)
            a_r = RnsPoly(evk.a[row, :L], q_mods, EVAL)
            t0 = rns.mul(dig, b_r)
            t1 = rns.mul(dig, a_r)
            d0 = t0 if d0 is None else rns.add(d0, t0)
            d1 = t1 if d1 is None else rns.add(d1, t1)
            row += 1
    return d0, d1
