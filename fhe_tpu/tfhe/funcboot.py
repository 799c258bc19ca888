"""Functional bootstrap family: EvalFunc / EvalFloor / EvalSign / EvalDecomp.

Semantics mirror /root/reference/src/binfhe/lib/binfhe-base-scheme.cpp
(EvalFunc :240-310 with the negacyclic/periodic/arbitrary LUT trichotomy,
EvalFloor :312-360, EvalSign :362-440, EvalDecomp :442-500, per eprint
2021/1337) and BootstrapFunc(Core) :589-650; beta = 128
(binfhecontext.h:445).  The LUT enters the pipeline as a traced uint32
table so every function shares one compiled bootstrap, and all ops carry
the batch axis.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..math import ntt as nttmod
from ..math.modmath import U32, add_mod, sub_mod, neg_mod, u32
from .params import TfheParams
from . import lwe, rgsw, boot

BETA = 128


# -- LWE helper ops (lwe-pke.cpp:230-251) -----------------------------------

def add_const(ct: lwe.LweCiphertext, c: int) -> lwe.LweCiphertext:
    q = ct.modulus
    return lwe.LweCiphertext(ct.a, add_mod(ct.b, u32(c % q), q), q, ct.pt_mod)


def sub_const(ct: lwe.LweCiphertext, c: int) -> lwe.LweCiphertext:
    q = ct.modulus
    return lwe.LweCiphertext(ct.a, sub_mod(ct.b, u32(c % q), q), q, ct.pt_mod)


def sub(ct1: lwe.LweCiphertext, ct2: lwe.LweCiphertext) -> lwe.LweCiphertext:
    q = ct1.modulus
    return lwe.LweCiphertext(sub_mod(ct1.a, ct2.a, q),
                             sub_mod(ct1.b, ct2.b, q), q, ct1.pt_mod)


def set_modulus(ct: lwe.LweCiphertext, q_new: int) -> lwe.LweCiphertext:
    """Reduce components into a smaller modulus (lwe-ciphertext.h:116-120)
    or reinterpret under a larger one."""
    if q_new >= ct.modulus:
        return lwe.LweCiphertext(ct.a, ct.b, q_new, ct.pt_mod)
    assert ct.modulus % q_new == 0
    m = u32(q_new - 1)  # moduli here are powers of two
    assert q_new & (q_new - 1) == 0
    return lwe.LweCiphertext(ct.a & m, ct.b & m, q_new, ct.pt_mod)


# -- core functional bootstrap ------------------------------------------------

def bootstrap_func(params: TfheParams, key: rgsw.BootstrapKey,
                   ct: lwe.LweCiphertext, f_table: np.ndarray, f_mod: int,
                   ntt_impl: str | None = None) -> lwe.LweCiphertext:
    """BootstrapFunc (:630-650): functional bootstrap with LUT f_table
    over Z_{ct.modulus} -> Z_{f_mod}; output modulus f_mod."""
    ct_mod = ct.modulus
    if ntt_impl is None:
        ntt_impl = boot.auto_gate_impl(params, key)
    impl, plan, mxu = boot.resolve_ntt(params, ntt_impl)
    fn = _jitted_func_boot(params, ct_mod, f_mod, ct.pt_mod, impl)
    tbl = jnp.asarray(np.asarray(f_table, dtype=np.uint32))
    return fn(key, ct, tbl, plan, mxu)


@functools.lru_cache(maxsize=None)
def _jitted_func_boot(params: TfheParams, ct_mod: int, f_mod: int,
                      pt_mod: int, ntt_impl: str | None):
    def fn(key, ct, f_table, plan, mxu):
        N, Q = params.N, params.Q
        lead = ct.batch_shape
        a = ct.a.reshape(-1, params.n)
        b = ct.b.reshape(-1)
        # test vector (BootstrapFuncCore:589-625): coefficient j*factor gets
        # Q/fmod * f((b - j) mod ctmod) for j in [0, ctmod/2)
        factor = (2 * N) // ct_mod
        j = jnp.arange(ct_mod >> 1, dtype=U32)[None, :]
        bj = sub_mod(b[:, None], j, ct_mod)
        fv = jnp.take(f_table, bj.astype(jnp.int32), axis=0)
        vals = u32(Q // f_mod) * fv
        tv = jnp.zeros(b.shape + (N,), dtype=U32)
        tv = tv.at[:, ::factor].set(vals)
        acc = boot.bootstrap_core(params, key, tv, a, ntt_impl,
                                  a_modulus=ct_mod, plan=plan, mxu=mxu)
        ex_impl = "mxu" if ntt_impl == "mega2" else ntt_impl
        ct_ext = boot.extract_lwe(params, acc, jnp.asarray(np.uint32(0)),
                                  ex_impl, plan, mxu)
        ct_ext = lwe.LweCiphertext(a=ct_ext.a.reshape(*lead, N),
                                   b=ct_ext.b.reshape(lead), modulus=Q,
                                   pt_mod=pt_mod)
        ct_ms = lwe.mod_switch(ct_ext, params.q_ks)
        ct_ks = lwe.key_switch(params, key.ksk, ct_ms)
        return lwe.mod_switch(ct_ks, f_mod)
    return jax.jit(fn)


def _lut_property(lut: np.ndarray, q: int) -> int:
    """0 = negacyclic, 1 = periodic, 2 = arbitrary (binfhe-base-scheme.h:245)."""
    mid = len(lut) // 2
    if lut[0] == (q - lut[mid]) % q and np.all(
            lut[1:mid] == (q - lut[mid + 1:]) % q):
        return 0
    if lut[0] == lut[mid] and np.all(lut[1:mid] == lut[mid + 1:]):
        return 1
    return 2


def _f0_table(q: int, f_mod: int) -> np.ndarray:
    """f0(x) = fmod - q/4 for x < q/2 else q/4 (the half-range shifter)."""
    x = np.arange(q, dtype=np.uint64)
    return np.where(x < q // 2, f_mod - q // 4, q // 4).astype(np.uint32)


def eval_func(params: TfheParams, key: rgsw.BootstrapKey,
              ct: lwe.LweCiphertext, lut: np.ndarray,
              beta: int = BETA, ntt_impl: str | None = None
              ) -> lwe.LweCiphertext:
    """EvalFunc (:240-310): arbitrary LUT over Z_q."""
    q = ct.modulus
    lut = np.asarray(lut, dtype=np.uint64)
    prop = _lut_property(lut, q)

    if prop == 0:     # negacyclic: one bootstrap
        ct1 = add_const(ct, beta)
        return bootstrap_func(params, key, ct1, lut, q, ntt_impl)

    if prop == 1:     # periodic: shift to [0, q/2) then evaluate
        ct1 = add_const(ct, beta)
        ct2 = bootstrap_func(params, key, ct1, _f0_table(q, q), q, ntt_impl)
        ct2 = sub(ct, ct2)                      # EvalSubEq2(ct, ct2)
        ct2 = add_const(ct2, beta)
        ct2 = sub_const(ct2, q >> 2)
        x = np.arange(q, dtype=np.uint64)
        lut1 = np.where(x < q // 2, lut[x % (q // 2)],
                        (q - lut[(x - q // 2) % (q // 2)]) % q)
        return bootstrap_func(params, key, ct2, lut1.astype(np.uint32), q,
                              ntt_impl)

    # arbitrary: double the modulus (q must divide N)
    N = params.N
    if q > N:
        raise ValueError("arbitrary-function LUT requires ct modulus <= N")
    dq = q << 1
    lut2 = np.concatenate([lut, lut])
    ct1 = set_modulus(ct, dq)                   # raise q -> 2q
    ct2 = add_const(ct1, beta)
    ct3 = bootstrap_func(params, key, ct2, _f0_table(dq, dq), dq, ntt_impl)
    ct3 = sub(ct1, ct3)                         # EvalSubEq2(ct1, ct3)
    ct3 = add_const(ct3, beta)
    ct3 = sub_const(ct3, q >> 1)
    x = np.arange(dq, dtype=np.uint64)
    lutf = np.where(x < dq // 2, lut2[x % q],
                    (dq - lut2[(x - dq // 2) % q]) % dq)
    ct4 = bootstrap_func(params, key, ct3, lutf.astype(np.uint32), dq,
                         ntt_impl)
    return set_modulus(ct4, q)


def eval_floor(params: TfheParams, key: rgsw.BootstrapKey,
               ct: lwe.LweCiphertext, beta: int = BETA,
               roundbits: int = 0, ntt_impl: str | None = None
               ) -> lwe.LweCiphertext:
    """EvalFloor (:312-360): clear the low log2(q) bits of a
    large-modulus ciphertext."""
    q = params.q if roundbits == 0 else beta * (1 << (roundbits + 1))
    mod = ct.modulus
    ct1 = add_const(ct, beta)
    ct1modq = set_modulus(ct1, q)
    ct2 = bootstrap_func(params, key, ct1modq, _f0_table(q, mod), mod,
                         ntt_impl)
    ct1 = sub(ct1, ct2)
    ct2modq = set_modulus(ct1, q)
    x = np.arange(q, dtype=np.uint64)
    f2 = np.where(x < q // 4, (mod - q // 2 - x) % mod,
                  np.where(x < 3 * (q // 4), x, (mod + q // 2 - x) % mod))
    ct3 = bootstrap_func(params, key, ct2modq, f2.astype(np.uint32), mod,
                         ntt_impl)
    return sub(ct1, ct3)


def eval_sign(params: TfheParams, key: rgsw.BootstrapKey,
              ct: lwe.LweCiphertext, beta: int = BETA,
              scheme_switch: bool = False, ntt_impl: str | None = None
              ) -> lwe.LweCiphertext:
    """EvalSign (:362-440): large-precision MSB via iterated flooring."""
    q = params.q
    mod = ct.modulus
    if mod <= q:
        raise ValueError("EvalSign requires ct modulus > q")
    cttmp = ct
    while mod > q:
        cttmp = eval_floor(params, key, cttmp, beta, 0, ntt_impl)
        mod = (mod * 2 * beta) // q
        cttmp = lwe.mod_switch(cttmp, mod)
    cttmp = add_const(cttmp, beta)
    # the ladder may end BELOW q: the MSB threshold is the ciphertext's
    # CURRENT modulus (the reference's f3(x, ctMod, fmod) evaluates
    # x < ctMod/2, binfhe-base-scheme.cpp:439-451)
    cm = cttmp.modulus
    x = np.arange(cm, dtype=np.uint64)
    if not scheme_switch:
        f3 = np.where(x < cm // 2, q // 4, q - q // 4)
        out = bootstrap_func(params, key, cttmp, f3.astype(np.uint32), q,
                             ntt_impl)
        return sub_const(out, q >> 2)
    f3 = np.where(x < cm // 2, q - q // 4, q // 4)
    return bootstrap_func(params, key, cttmp, f3.astype(np.uint32), q,
                          ntt_impl)


def eval_decomp(params: TfheParams, key: rgsw.BootstrapKey,
                ct: lwe.LweCiphertext, beta: int = BETA,
                ntt_impl: str | None = None) -> list[lwe.LweCiphertext]:
    """EvalDecomp (:442-500): digit decomposition of a large-modulus ct."""
    q = params.q
    mod = ct.modulus
    if mod <= q:
        raise ValueError("EvalDecomp requires ct modulus > q")
    cttmp = ct
    out = []
    while mod > q:
        out.append(set_modulus(cttmp, q))
        cttmp = eval_floor(params, key, cttmp, beta, 0, ntt_impl)
        mod = (mod * 2 * beta) // q
        cttmp = lwe.mod_switch(cttmp, mod)
    out.append(cttmp)
    return out


def generate_lut(f, p: int, q: int) -> np.ndarray:
    """GenerateLUTviaFunction (binfhecontext.cpp:372-388): LUT[i] =
    (q/p) * f(i // (q/p), p) over i in [0, q)."""
    assert p & (p - 1) == 0
    step = q // p
    i = np.arange(q, dtype=np.uint64)
    vals = np.array([int(f(int(m), p)) for m in range(p)], dtype=np.uint64)
    assert vals.max() < p, "function must output in Z_p"
    return (vals[(i // step).astype(np.int64)] * step).astype(np.uint32)
