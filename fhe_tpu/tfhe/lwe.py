"""LWE scheme: keygen, encrypt/decrypt, modulus & key switching.

Semantics mirror the reference LWEEncryptionScheme
(/root/reference/src/binfhe/lib/lwe-pke.cpp): RoundqQ (:41), KeyGen (:48),
Encrypt (:103, b = m*(q/p) + e + <a,s>), Decrypt (:182, floor(p/q*(b-<a,s>)
+ 1/2)), KeySwitchGen/KeySwitch (tabulated j*Bks^k*skN[i] encryptions),
SwitchCTtoqn (:170, ModSwitch -> KeySwitch -> ModSwitch) -- re-architected
for TPU: everything carries arbitrary leading batch dimensions, all device
code is uint32, keys live on device as pytrees, and key switching has both
a gather path and an MXU one-hot-matmul path.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..math.modmath import (U32, add_mod, sub_mod, neg_mod, round_scale_mod,
                            sum_mod, u32)
from .params import TfheParams, KeyDist


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LweCiphertext:
    """(a, b) with b = <a,s> + e + encode(m); arbitrary leading batch dims.

    a: [..., n] uint32, b: [...] uint32; modulus/ptmod are static.
    """
    a: jax.Array
    b: jax.Array
    modulus: int = dataclasses.field(metadata=dict(static=True))
    pt_mod: int = dataclasses.field(metadata=dict(static=True), default=4)

    @property
    def n(self) -> int:
        return self.a.shape[-1]

    @property
    def batch_shape(self):
        return self.b.shape


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LweSecretKey:
    """Secret key as small signed ints (ternary {-1,0,1} or Gaussian).

    Stored signed so it can be reduced into any modulus (the reference's
    NativeVector::SwitchModulus on small secrets)."""
    s: jax.Array  # [n] int32


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LweSwitchingKey:
    """KSK[i, k, j] = LWE_{sk,qKS}(j * Bks^k * skN[i]).

    a: [N, dc, Bks, n] uint32; b: [N, dc, Bks] uint32.
    Reference layout: lwe-pke.cpp KeySwitchGen (A[i][j][k])."""
    a: jax.Array
    b: jax.Array


def _sample_error(rng: np.random.Generator, shape, std: float) -> np.ndarray:
    """Rounded-Gaussian error (functional analogue of the reference's
    Peikert-inversion DGG, math/discretegaussiangenerator-impl.h)."""
    return np.rint(rng.normal(0.0, std, size=shape)).astype(np.int64)


def keygen(params: TfheParams, rng: np.random.Generator,
           dim: int | None = None) -> LweSecretKey:
    """Ternary (or Gaussian) secret of dimension n (lwe-pke.cpp:48-56)."""
    dim = params.n if dim is None else dim
    if params.key_dist == KeyDist.GAUSSIAN:
        s = _sample_error(rng, dim, params.std_dev)
    else:
        s = rng.integers(-1, 2, size=dim, dtype=np.int64)
    return LweSecretKey(s=jnp.asarray(s.astype(np.int32)))


def _sk_mod(sk: LweSecretKey, modulus: int) -> jax.Array:
    """Signed secret reduced into [0, modulus)."""
    return (sk.s % jnp.int32(modulus)).astype(U32)


def encrypt(params: TfheParams, sk: LweSecretKey, m, rng: np.random.Generator,
            p: int = 4, modulus: int | None = None) -> LweCiphertext:
    """b = (m mod p)*(q/p) + e + <a, s> mod q (lwe-pke.cpp:103-128).

    m: int or int array -> batch of ciphertexts."""
    q = params.q if modulus is None else modulus
    m = np.asarray(m, dtype=np.int64)
    n = int(sk.s.shape[0])
    a_np = rng.integers(0, q, size=m.shape + (n,), dtype=np.int64)
    e = _sample_error(rng, m.shape, params.std_dev)
    b0 = ((m % p) * (q // p) + e) % q
    a = jnp.asarray(a_np.astype(np.uint32))
    s = _sk_mod(sk, q)
    dot = _dot_mod(a, s, q)
    b = add_mod(jnp.asarray(b0.astype(np.uint32)), dot, q)
    return LweCiphertext(a=a, b=b, modulus=q, pt_mod=p)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LwePublicKey:
    """LWE public key over the ring dimension N (lwe-pke.cpp PubKeyGen
    :74-99): A [N, N] uniform, v = A s + e (both mod Q)."""
    A: jax.Array   # [N, N] uint32
    v: jax.Array   # [N] uint32
    modulus: int = dataclasses.field(metadata=dict(static=True))


def pub_key_gen(params: TfheParams, sk_n: LweSecretKey,
                rng: np.random.Generator) -> LwePublicKey:
    """PubKeyGen: v_j = <A[j], s> + e_j mod Q (host numpy, exact)."""
    Q = params.Q
    if Q > (1 << 32):
        raise NotImplementedError("public-key mode needs Q < 2^32 "
                                  "(use a non-RNS paramset)")
    N = int(sk_n.s.shape[0])
    A = rng.integers(0, Q, size=(N, N), dtype=np.int64)
    s = np.asarray(sk_n.s, dtype=np.int64)
    e = _sample_error(rng, N, params.std_dev)
    # ternary/Gaussian s is tiny: |A @ s| < N*Q*|s|_max < 2^63, int64-exact
    v = (A @ s + e) % Q
    return LwePublicKey(A=jnp.asarray(A.astype(np.uint32)),
                        v=jnp.asarray(v.astype(np.uint32)), modulus=Q)


def encrypt_pk(params: TfheParams, pk: LwePublicKey, m,
               rng: np.random.Generator, p: int = 4) -> LweCiphertext:
    """Public-key encryption (lwe-pke.cpp EncryptN :133-168): ternary
    combiner sp; a = A^t sp + e_a, b = m*(Q/p) + e_b + <v, sp>.
    Produces dimension-N ciphertexts at modulus Q; switch_ct_to_qn
    brings them to (n, q) for gate evaluation."""
    Q = pk.modulus
    m = np.asarray(m, dtype=np.int64)
    A = np.asarray(pk.A, dtype=np.int64)
    v = np.asarray(pk.v, dtype=np.int64)
    N = A.shape[0]
    sp = rng.integers(-1, 2, size=m.shape + (N,), dtype=np.int64)
    e_a = _sample_error(rng, m.shape + (N,), params.std_dev)
    e_b = _sample_error(rng, m.shape, params.std_dev)
    # sp is ternary: A^t sp sums signed rows, |.| < N*Q < 2^63
    a = (sp @ A + e_a) % Q
    b = ((m % p) * (Q // p) + e_b + sp @ v) % Q
    return LweCiphertext(a=jnp.asarray(a.astype(np.uint32)),
                         b=jnp.asarray(b.astype(np.uint32)),
                         modulus=Q, pt_mod=p)


def mul_mod_vec(a: jax.Array, s, q: int) -> jax.Array:
    """a * s mod q elementwise for uint32 inputs in [0, q).

    Power-of-two q: wrapping uint32 multiply + mask (exact).
    Odd q (the NTT prime Q): Montgomery with a to-Montgomery hop."""
    from ..math.modmath import mont_constants, mont_mul
    if q & (q - 1) == 0:
        return (u32(a) * u32(s)) & u32(q - 1)
    qinv_neg, _r1, r2 = mont_constants(q)
    am = mont_mul(u32(a), u32(r2), q, u32(qinv_neg))  # a*R mod q
    return mont_mul(am, u32(s), q, u32(qinv_neg))


def _dot_mod(a: jax.Array, s: jax.Array, q: int) -> jax.Array:
    """<a, s> mod q for uint32 a [..., n], s [n] in [0, q)."""
    prod = mul_mod_vec(a, jnp.broadcast_to(s, a.shape), q)
    return sum_mod(prod, axis=-1, q=q)


def decrypt(params: TfheParams, sk: LweSecretKey, ct: LweCiphertext,
            p: int | None = None) -> jax.Array:
    """floor(p/q * (b - <a,s>) + 1/2) (lwe-pke.cpp:182-214)."""
    p = ct.pt_mod if p is None else p
    q = ct.modulus
    s = _sk_mod(sk, q)
    inner = _dot_mod(ct.a, s, q)
    r = sub_mod(ct.b, inner, q)
    r = add_mod(r, u32(q // (p * 2)), q)
    # result = floor(p * r / q): exact via round_scale helper on (p*r)/q
    from ..math.modmath import mul32_parts, divmod_u64_u32
    hi, lo = mul32_parts(r, u32(p))
    k, _ = divmod_u64_u32(hi, lo, q)
    return k.astype(jnp.int32) % jnp.int32(p)


def noise(params: TfheParams, sk: LweSecretKey, ct: LweCiphertext,
          m, p: int | None = None) -> jax.Array:
    """Signed error e = b - <a,s> - encode(m), for noise-growth tests."""
    p = ct.pt_mod if p is None else p
    q = ct.modulus
    s = _sk_mod(sk, q)
    inner = _dot_mod(ct.a, s, q)
    r = sub_mod(ct.b, inner, q)
    enc = u32((np.asarray(m) % p) * (q // p))
    e = sub_mod(r, enc, q).astype(jnp.int32)  # q < 2^31 so signed fits
    return jnp.where(e > jnp.int32(q // 2), e - jnp.int32(q), e)


def add(ct1: LweCiphertext, ct2: LweCiphertext) -> LweCiphertext:
    q = ct1.modulus
    return LweCiphertext(a=add_mod(ct1.a, ct2.a, q),
                         b=add_mod(ct1.b, ct2.b, q),
                         modulus=q, pt_mod=ct1.pt_mod)


def not_(ct: LweCiphertext) -> LweCiphertext:
    """EvalNOT: (-a, q/4 - b) (binfhe-base-scheme.cpp EvalNOT:223-236)."""
    q = ct.modulus
    return LweCiphertext(a=neg_mod(ct.a, q),
                         b=sub_mod(u32(q >> 2), ct.b, q),
                         modulus=q, pt_mod=ct.pt_mod)


def mod_switch(ct: LweCiphertext, q_to: int) -> LweCiphertext:
    """RoundqQ on every component (lwe-pke.cpp ModSwitch)."""
    Q = ct.modulus
    return LweCiphertext(
        a=round_scale_mod(ct.a, q_to, Q, q_to),
        b=round_scale_mod(ct.b, q_to, Q, q_to),
        modulus=q_to, pt_mod=ct.pt_mod)


def key_switch_gen(params: TfheParams, sk: LweSecretKey, sk_n: LweSecretKey,
                   rng: np.random.Generator) -> LweSwitchingKey:
    """KSK[i,k,j] encrypting j * Bks^k * skN[i] under sk, mod qKS
    (lwe-pke.cpp KeySwitchGen). Host-side numpy (exact), device output."""
    q = params.q_ks
    n = int(sk.s.shape[0])
    N = int(sk_n.s.shape[0])
    bks, dc = params.base_ks, params.digits_ks
    s = np.asarray(sk.s, dtype=np.int64) % q
    sN = np.asarray(sk_n.s, dtype=np.int64) % q

    a = rng.integers(0, q, size=(N, dc, bks, n), dtype=np.int64)
    e = _sample_error(rng, (N, dc, bks), params.std_dev)
    pow_k = np.array([pow(bks, k, q) for k in range(dc)], dtype=np.int64)
    j = np.arange(bks, dtype=np.int64)
    msg = (sN[:, None, None] * pow_k[None, :, None] * j[None, None, :]) % q
    dot = (a.reshape(-1, n) @ s).reshape(N, dc, bks) % q
    b = (msg + e + dot) % q
    return LweSwitchingKey(a=jnp.asarray(a.astype(np.uint32)),
                           b=jnp.asarray(b.astype(np.uint32)))


def key_switch(params: TfheParams, ksk: LweSwitchingKey,
               ct: LweCiphertext, impl: str | None = None) -> LweCiphertext:
    """Dim N -> dim n at modulus qKS: (a', b') = (0, b) - sum_{i,k}
    KSK[i, k, digit_{i,k}(a_i)] (lwe-pke.cpp KeySwitch).

    impl="gather": dynamic-gather the selected rows (exact, any batch,
    but materializes [B, N*dc, n] -- ~25 GB at B=4096/STD128).
    impl="onehot": one-hot int8 MXU matmul (throughput path; any qKS --
    the plane recombination reduces mod q explicitly).
    impl=None: onehot for batches >= 8 (MXU-saturating and memory-lean),
    gather for small/latency calls."""
    q = params.q_ks
    assert ct.modulus == q
    if impl is None:
        B_auto = int(np.prod(ct.batch_shape)) if ct.batch_shape else 1
        impl = "onehot" if B_auto >= 8 else "gather"
    bks, dc = params.base_ks, params.digits_ks
    N = ct.a.shape[-1]
    n = ksk.a.shape[-1]
    lead = ct.batch_shape
    a_in = ct.a.reshape(-1, N)
    B = a_in.shape[0]

    # digits d[b, i, k] = (a[b,i] // bks^k) % bks
    shifts = np.array([bks ** k for k in range(dc)], dtype=np.uint32)
    d = (a_in[..., None] // shifts) % u32(bks)            # [B, N, dc]

    if impl == "onehot":
        # one-hot selection as an int8 MXU matmul: exact because the KSK is
        # pre-split into 7-bit digit planes and each int32 accumulator sums
        # at most N*dc terms of magnitude < 2^14 (<2^31 total for N<=4096).
        from ..math.modmath import barrett_reduce_u32
        planes = max(1, -(-(q - 1).bit_length() // 7))
        oh = (d[..., None] == jnp.arange(bks, dtype=U32))
        oh = oh.reshape(B, N * dc * bks).astype(jnp.int8)  # [B, N*dc*bks]
        tbl = jnp.concatenate(
            [ksk.a.reshape(N * dc * bks, n), ksk.b.reshape(N * dc * bks, 1)],
            axis=-1)
        parts = jnp.concatenate(
            [((tbl >> (7 * v)) & u32(127)).astype(jnp.int8)
             for v in range(planes)], axis=-1)             # [N*dc*bks, planes*(n+1)]
        acc = jax.lax.dot_general(
            oh, parts, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)              # [B, planes*(n+1)]
        # exact: each row sums N*dc plane digits < 128 -> acc < 2^31
        acc = acc.reshape(B, planes, n + 1).astype(U32)
        mu = np.uint32((1 << 32) // q)
        tot = jnp.zeros((B, n + 1), dtype=U32)
        for v in range(planes):
            term = mul_mod_vec(barrett_reduce_u32(acc[:, v, :], q, mu),
                               u32((1 << (7 * v)) % q), q)
            tot = add_mod(tot, term, q)
        sa, sb = tot[:, :n], tot[:, n]
        a_out = neg_mod(sa, q)
        b_out = sub_mod(ct.b.reshape(-1), sb, q)
        return LweCiphertext(a=a_out.reshape(*lead, n), b=b_out.reshape(lead),
                             modulus=q, pt_mod=ct.pt_mod)

    flat = d.reshape(B, N * dc)                            # [B, N*dc]
    ka = ksk.a.reshape(N * dc, bks, n)
    kb = ksk.b.reshape(N * dc, bks)

    def one(idx_row):
        # idx_row: [N*dc] -> selected rows [N*dc, n] and [N*dc]
        sel_a = jnp.take_along_axis(ka, idx_row[:, None, None].astype(jnp.int32),
                                    axis=1)[:, 0, :]
        sel_b = jnp.take_along_axis(kb, idx_row[:, None].astype(jnp.int32),
                                    axis=1)[:, 0]
        return sum_mod(sel_a, axis=0, q=q), sum_mod(sel_b, axis=0, q=q)

    sa, sb = jax.vmap(one)(flat)
    a_out = neg_mod(sa, q)
    b_out = sub_mod(ct.b.reshape(-1), sb, q)
    return LweCiphertext(a=a_out.reshape(*lead, n),
                         b=b_out.reshape(lead),
                         modulus=q, pt_mod=ct.pt_mod)


def switch_ct_to_qn(params: TfheParams, ksk: LweSwitchingKey,
                    ct: LweCiphertext) -> LweCiphertext:
    """ModSwitch(qKS) -> KeySwitch -> ModSwitch(q) (lwe-pke.cpp:170-178)."""
    ct_ms = mod_switch(ct, params.q_ks)
    ct_ks = key_switch(params, ksk, ct_ms)
    return mod_switch(ct_ks, params.q)
