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
    if c.fmt == EVAL:
        return mod_down_eval(params, c)
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


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PreparedEvalKey:
    """HYBRID switching key in device execution form: the (b, a) digit
    stacks pre-converted to Montgomery representation, so each key-switch
    inner product costs exactly ONE REDC per limb-point instead of a REDC
    plus an in-graph to-Montgomery conversion of the key operand (the
    reference's analogue is the precomputed EVAL-format key cache fed to
    EvalFastKeySwitchCore, keyswitch-hybrid.cpp).

    Create once with `prepare_evk` OUTSIDE jit; pass anywhere an EvalKey
    is accepted."""
    b_mont: jax.Array      # [dnum, L_qp, N] uint32, Montgomery form
    a_mont: jax.Array
    moduli_qp: tuple = dataclasses.field(metadata=dict(static=True))
    num_per_part: int = dataclasses.field(metadata=dict(static=True))


def prepare_evk(params, evk: EvalKey) -> PreparedEvalKey:
    """Convert an EvalKey's digit stacks to Montgomery form (one-time)."""
    plan = rns.make_rns_plan(evk.b.shape[-1], evk.moduli_qp)
    conv = lambda x: mont_mul_arr(x, plan.r2[:, None], plan.q_arr[:, None],
                                  plan.qinv_neg[:, None])
    return PreparedEvalKey(b_mont=conv(evk.b), a_mont=conv(evk.a),
                           moduli_qp=evk.moduli_qp,
                           num_per_part=evk.num_per_part)


def mont_mul_arr(a, b, q, qinv):
    from ..math.modmath import mont_mul
    return mont_mul(a, b, q, qinv)


def mod_down_eval(params, t: RnsPoly, drop_q: int = 0) -> RnsPoly:
    """EVALUATION-domain ApproxModDown, optionally fused with CKKS
    rescale: divide t (over basis Q_l + P, EVAL) by P * (product of the
    last `drop_q` q-limbs), returning an EVAL poly over the shortened
    Q basis.

    The reference round-trips the FULL extended basis through COEFFICIENT
    format (dcrtpoly-impl.h:988 ApproxModDown operates limb-wise on COEFF
    data); here only the |P| + drop_q dropped limbs are iNTT'd, the
    switched correction is NTT'd back over the kept limbs, and the
    subtraction + scaling stay in EVAL — 2x fewer limb transforms, and
    rescale fusion (drop_q = composite degree) removes the separate
    ModReduce COEFF round-trip entirely (ckksrns-leveledshe.cpp:162-183).

    For BGV (params.scheme == "BGV") the dropped-limb correction is
    lifted to a multiple of the plaintext modulus t, as in the
    reference's tInvModq path."""
    from ..math.modmath import mont_mul, sub_mod
    ext_mods = t.moduli
    p_mods = tuple(params.special_mods)
    kp = len(p_mods)
    Lq_full = len(ext_mods) - kp          # q-limbs present
    assert ext_mods[Lq_full:] == p_mods
    keep = Lq_full - drop_q
    keep_mods = ext_mods[:keep]
    d_mods = ext_mods[keep:]              # dropped q-limbs + P (contiguous)
    plan_d = rns.make_rns_plan(t.N, d_mods)
    plan_k = rns.make_rns_plan(t.N, keep_mods)

    tmod = params.plain_mod if params.scheme == "BGV" else None
    x_d = t.data[..., keep:, :]
    if tmod is not None:
        tinv = np.array([pow(tmod % m, -1, m) for m in d_mods],
                        dtype=np.uint32)
        tinv_m = jnp.asarray([(int(v) << 32) % m
                              for v, m in zip(tinv, d_mods)],
                             dtype=jnp.uint32)
        x_d = mont_mul(x_d, tinv_m[:, None], plan_d.q_arr[:, None],
                       plan_d.qinv_neg[:, None])
    x_d = rns.ntt_inverse(plan_d, x_d)
    if drop_q > 0:
        # fused rescale: the result is FINAL-level data, so the slack on
        # c1 would multiply the secret (u*s noise, ~|D| * sqrt(N) per
        # coefficient after decryption) with no later rescale to shrink
        # it -- use the EXACT switch (HPS 96-bit accumulation) so the
        # joint P*q_block drop is floor-exact, like the reference's
        # DropLastElementAndScale.  The pure-P ModDown keeps the approx
        # switch (bit-compatible with ApproxModDown; its slack is
        # divided away by the subsequent rescale).
        sw = rns.switch_crt_basis_exact(
            rns.RnsPoly(x_d, d_mods, COEFF), keep_mods)
    else:
        sw = rns.switch_crt_basis_approx(
            rns.RnsPoly(x_d, d_mods, COEFF), keep_mods)
    sw_eval = rns.ntt_forward(plan_k, sw.data)
    if tmod is not None:
        tm = jnp.asarray([(int(tmod % m) << 32) % m for m in keep_mods],
                         dtype=jnp.uint32)
        sw_eval = mont_mul(sw_eval, tm[:, None], plan_k.q_arr[:, None],
                           plan_k.qinv_neg[:, None])
    D = 1
    for m in d_mods:
        D *= m
    dinv = jnp.asarray([(pow(D % m, -1, m) << 32) % m for m in keep_mods],
                       dtype=jnp.uint32)                 # Montgomery form
    qk = plan_k.q_arr[:, None]
    diff = sub_mod(t.data[..., :keep, :], sw_eval, qk)
    out = mont_mul(diff, dinv[:, None], qk, plan_k.qinv_neg[:, None])
    return RnsPoly(out, keep_mods, EVAL)


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


@functools.lru_cache(maxsize=None)
def _sw_maps(q_mods: tuple, p_mods: tuple, npp: int):
    """Host index maps for the switched-rows-only ModUp: for each digit d
    the rows of the extended basis OUTSIDE d's own limb window need a
    CRT basis switch (and a forward NTT); the rows INSIDE the window are
    the input limbs verbatim and reuse the caller's EVAL data with no
    transform.  Returns (sw_digit[r], sw_pos[r], sw_mods, perm) where
    perm[(d, j)] gathers the final [dnum, M] EVAL stack out of
    concat(switched_ntt [n_sw], x_eval [L])."""
    L = len(q_mods)
    ext = tuple(q_mods) + tuple(p_mods)
    M = len(ext)
    dnum = -(-L // npp)
    sw_digit, sw_pos, sw_mods = [], [], []
    perm = np.zeros(dnum * M, dtype=np.int32)
    for d in range(dnum):
        lo, hi = d * npp, min((d + 1) * npp, L)
        for j in range(M):
            if lo <= j < hi:
                perm[d * M + j] = len(ext) * 0 + j      # x_eval row j
            else:
                perm[d * M + j] = -(len(sw_digit) + 1)  # switched row marker
                sw_digit.append(d)
                sw_pos.append(j)
                sw_mods.append(ext[j])
    n_sw = len(sw_digit)
    # resolve markers: src = concat(switched [n_sw], x_eval [L])
    out_perm = np.zeros(dnum * M, dtype=np.int32)
    for i, v in enumerate(perm):
        out_perm[i] = (-v - 1) if v < 0 else (n_sw + v)
    return (np.array(sw_digit, np.int32), np.array(sw_pos, np.int32),
            tuple(sw_mods), out_perm)


def key_switch_core(params, evk, c: RnsPoly,
                    extra: tuple | None = None, drop_q: int = 0
                    ) -> tuple[RnsPoly, RnsPoly]:
    """HYBRID KeySwitchCore, fully fused and EVAL-centric
    (keyswitch-hybrid.cpp:322-380 + ApproxModDown, re-architected):

      * digit ModUp computes ONLY the switched rows (the digit's own limbs
        reuse the input's EVALUATION data -- dnum*M - L forward NTTs
        instead of dnum*M);
      * the digit inner products run against Montgomery-form key stacks
        (PreparedEvalKey) -- one REDC per limb-point;
      * `extra = (e0, e1)` (EVAL over Q_l) is scaled by P and folded into
        the extended-basis accumulators, so EvalMult's d0/d1 ride the SAME
        ModDown (relinearize + rescale share one basis change);
      * ModDown runs in EVALUATION format (mod_down_eval), optionally
        dropping the last `drop_q` q-limbs too (fused CKKS rescale).

    Returns (d0, d1) over Q_{l-drop_q} in EVAL.  With drop_q > 0 the
    joint drop uses the EXACT basis switch, making the fused result
    BIT-identical to the sequential relinearize-then-ModReduce pipeline
    (both are floor(t / (P * q_block))); the pure ModDown (drop_q = 0)
    keeps the reference's ApproxModDown slack semantics."""
    from ..math.modmath import mont_mul, add_mod
    q_mods = c.moduli
    L = len(q_mods)
    p_mods = tuple(params.special_mods)
    ext_mods = tuple(q_mods) + p_mods
    M = len(ext_mods)
    npp = params.num_per_part
    dnum = -(-L // npp)
    N = c.N

    qhatinv_np, qhat_to_np, _ = _digit_consts(tuple(q_mods), p_mods, npp)
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

    sw_digit_np, sw_pos_np, sw_mods, perm_np = _sw_maps(tuple(q_mods),
                                                        p_mods, npp)
    n_sw = len(sw_mods)
    sw_plan = rns.make_rns_plan(N, sw_mods)
    ext_plan = rns.make_rns_plan(N, ext_mods)
    # per-switched-row constants: qto_sw[r, t] = qhat_to of digit d's
    # window limb t at target position sw_pos[r]
    qto_sw = qto_c[sw_digit_np, :, :][np.arange(n_sw), :, sw_pos_np]
    sw_q = np.array(sw_mods, np.uint32)
    sw_qinv = np.array([(-pow(int(m), -1, 1 << 32)) % (1 << 32)
                        for m in sw_mods], np.uint32)

    idx = jnp.asarray([evk.moduli_qp.index(q) for q in ext_mods])
    prepared = isinstance(evk, PreparedEvalKey)
    evb = jnp.take(evk.b_mont if prepared else evk.b, idx, axis=1)[:dnum]
    eva = jnp.take(evk.a_mont if prepared else evk.a, idx, axis=1)[:dnum]

    eq = ext_plan.q_arr[:, None]
    einv = ext_plan.qinv_neg[:, None]
    if not prepared:
        r2 = ext_plan.r2[:, None]
        evb = mont_mul(evb, r2[None], eq[None], einv[None])
        eva = mont_mul(eva, r2[None], eq[None], einv[None])

    pmodq_mont = None
    if extra is not None:
        pm = _p_mod_q(p_mods, tuple(q_mods))
        pmodq_mont = jnp.asarray(
            np.array([(int(v) << 32) % q for v, q in zip(pm, q_mods)],
                     np.uint32))
    qk = rns.make_rns_plan(N, tuple(q_mods)).q_arr[:, None]
    qkinv = rns.make_rns_plan(N, tuple(q_mods)).qinv_neg[:, None]

    def _core(x_coeff, x_eval, e0, e1):
        """Leading-dim-polymorphic: x_* are [..., L, N]; every step uses
        axis-relative ops (no vmap -- batched calls compile to the same
        HLO as single calls with one more major dimension)."""
        lead = x_coeff.shape[:-2]
        if Lp != L:
            xp = jnp.concatenate(
                [x_coeff, jnp.zeros(lead + (Lp - L, N), jnp.uint32)],
                axis=-2)
        else:
            xp = x_coeff
        xp = xp.reshape(lead + (dnum, npp, N))
        y = mont_mul(xp, jnp.asarray(qhi_c)[:, :, None],
                     jnp.asarray(qarr_c)[:, :, None],
                     jnp.asarray(qinv_c)[:, :, None])    # [..., dnum, npp, N]
        # switched rows only: acc[r] = sum_t y[sw_digit[r], t] * qto_sw[r, t]
        y_sw = jnp.take(y, jnp.asarray(sw_digit_np), axis=-3)
        terms = mont_mul(y_sw, jnp.asarray(qto_sw)[:, :, None],
                         jnp.asarray(sw_q)[:, None, None],
                         jnp.asarray(sw_qinv)[:, None, None])
        acc = terms[..., 0, :]
        for i in range(1, npp):
            acc = add_mod(acc, terms[..., i, :], jnp.asarray(sw_q)[:, None])
        acc = rns.ntt_forward(sw_plan, acc)              # [..., n_sw, N]
        src = jnp.concatenate([acc, x_eval], axis=-2)
        ups = jnp.take(src, jnp.asarray(perm_np), axis=-2
                       ).reshape(lead + (dnum, M, N))

        t0 = mont_mul(ups, evb, eq[None], einv[None])
        t1 = mont_mul(ups, eva, eq[None], einv[None])
        d0 = t0[..., 0, :, :]
        d1 = t1[..., 0, :, :]
        for d in range(1, dnum):
            d0 = add_mod(d0, t0[..., d, :, :], eq)
            d1 = add_mod(d1, t1[..., d, :, :], eq)

        if e0 is not None:
            pe0 = mont_mul(e0, pmodq_mont[:, None], qk, qkinv)
            pe1 = mont_mul(e1, pmodq_mont[:, None], qk, qkinv)
            d0 = jnp.concatenate(
                [add_mod(d0[..., :L, :], pe0, qk), d0[..., L:, :]], axis=-2)
            d1 = jnp.concatenate(
                [add_mod(d1[..., :L, :], pe1, qk), d1[..., L:, :]], axis=-2)

        both = rns.RnsPoly(jnp.stack([d0, d1]), ext_mods, EVAL)
        down = mod_down_eval(params, both, drop_q)
        return down.data[0], down.data[1]

    if c.fmt == EVAL:
        x_eval = c.data
        x_coeff = rns.to_coeff(c).data
    else:
        x_coeff = c.data
        x_eval = rns.to_eval(c).data
    e0 = extra[0].data if extra is not None else None
    e1 = extra[1].data if extra is not None else None

    out_mods = tuple(q_mods)[:L - drop_q]
    d0, d1 = _core(x_coeff, x_eval, e0, e1)
    return (RnsPoly(d0, out_mods, EVAL), RnsPoly(d1, out_mods, EVAL))


def key_switch_fused(params, evk, c: RnsPoly) -> tuple[RnsPoly, RnsPoly]:
    """KeySwitchCore (no extras, no rescale fusion) -- see
    key_switch_core."""
    return key_switch_core(params, evk, c)


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
