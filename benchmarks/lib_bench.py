"""Scheme-level (CryptoContext) benchmarks.

Mirrors /root/reference/benchmark/src/lib-benchmark.cpp:190-1043:
{BFVrns,CKKSrns,BGVrns}_{KeyGen, MultKeyGen, EvalAtIndexKeyGen,
Encryption, Decryption, Add, MultNoRelin, MultRelin, Relin,
Rescale|ModSwitch, EvalAtIndex}, plus the NativeNTT/INTT ring cases
(covered in poly_bench).

Key generation and host-encode paths report wall time (they are
host-side by design, like the reference's); homomorphic ops report pure
device time via dependent-chain differencing.  Ring dims follow the
BASELINE configs: CKKS N=2^14/8 limbs, BFV N=2^15/3 limbs, BGV N=2^13.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .core import Suite, rng as mkrng


def _ckks(s: Suite):
    from fhe_tpu.pke import ckks, rlwe
    from fhe_tpu.lattice import rns

    N = 1 << 14
    r = mkrng(1)
    s.wall("CKKSrns_ContextGen/n16384_l8",
           lambda: ckks.CkksContext.create(N=N, num_levels=7,
                                           scale_bits=26, dnum=3),
           iters=1, unit="us")
    ctx = ckks.CkksContext.create(N=N, num_levels=7, scale_bits=26, dnum=3)
    s.wall("CKKSrns_KeyGen/n16384", lambda: ctx.keygen(r), iters=1)
    sk, pk = ctx.keygen(r)
    s.wall("CKKSrns_MultKeyGen/n16384",
           lambda: ctx.relin_key_gen(sk, r), iters=1)
    evk_raw = ctx.relin_key_gen(sk, r)
    evk = rlwe.prepare_evk(ctx.params, evk_raw)
    s.wall("CKKSrns_EvalAtIndexKeyGen/n16384_1rot",
           lambda: ctx.rotation_key_gen(sk, [1], r), iters=1)
    rot = ctx.rotation_key_gen(sk, [1], r)
    rot = {k: rlwe.prepare_evk(ctx.params, v) for k, v in rot.items()}

    z = r.normal(size=N // 2) * 0.5
    s.wall("CKKSrns_Encryption/n16384", lambda: ctx.encrypt(pk, z, r),
           iters=3, ref_us=1733.0)
    ct = ctx.encrypt(pk, z, r)
    s.wall("CKKSrns_Decryption/n16384", lambda: ctx.decrypt(sk, ct),
           iters=3, ref_us=111.0)

    mods = tuple(ctx.params.moduli)

    def as_ct(x):
        return ckks.Ciphertext(rns.RnsPoly(x, mods, rns.EVAL),
                               rns.RnsPoly(x, mods, rns.EVAL), ctx.scale)

    s.device("CKKSrns_Add/n16384_l8",
             lambda x: ctx.add(as_ct(x), ct).c0.data, ct.c0.data,
             ref_us=100.0)
    s.device("CKKSrns_MultNoRelin/n16384_l8",
             lambda x: ctx.mul_no_relin(as_ct(x), ct).c0.data, ct.c0.data)
    s.device("CKKSrns_MultRelin/n16384_l8",
             lambda x: ctx.mul(as_ct(x), ct, evk).c0.data, ct.c0.data,
             ref_us=1470.0)

    ct3 = ctx.mul_no_relin(ct, ct)

    def relin_step(x):
        c3 = ckks.Ciphertext(rns.RnsPoly(x, mods, rns.EVAL), ct3.c1,
                             ct3.scale, c2=ct3.c2)
        return ctx.relinearize(c3, evk_raw).c0.data

    s.device("CKKSrns_Relin/n16384_l8", relin_step, ct3.c0.data,
             ref_us=1331.0)

    cd = ctx.cd

    def rescale_step(x):
        out = ctx.rescale(as_ct(x))
        return jnp.concatenate([out.c0.data, out.c0.data[..., -cd:, :]],
                               axis=-2)

    s.device("CKKSrns_Rescale/n16384_l8", rescale_step, ct.c0.data,
             ref_us=333.0)
    s.device("CKKSrns_EvalAtIndex/n16384_l8",
             lambda x: ctx.rotate(as_ct(x), 1, rot).c0.data, ct.c0.data,
             ref_us=1494.0)

    # fused mult+relin+rescale (the BASELINE config-3 pipeline)
    def fused(x):
        out = ctx.mul_rescale(as_ct(x), as_ct(x), evk)
        return jnp.concatenate([out.c0.data, out.c0.data[..., -cd:, :]],
                               axis=-2)

    s.device("CKKSrns_MultRelinRescale_fused/n16384_l8", fused,
             ct.c0.data, ref_us=1803.0)


def _bfv(s: Suite):
    from fhe_tpu.pke import bfv
    from fhe_tpu.lattice import rns

    N = 1 << 15
    r = mkrng(2)
    ctx = bfv.BfvContext.create(N=N, num_limbs=3, plain_mod=65537, dnum=3)
    s.wall("BFVrns_KeyGen/n32768", lambda: ctx.keygen(r), iters=1)
    sk, pk = ctx.keygen(r)
    s.wall("BFVrns_MultKeyGen/n32768",
           lambda: ctx.relin_key_gen(sk, r), iters=1)
    evk = ctx.relin_key_gen(sk, r)
    m = r.integers(0, 100, size=N)
    s.wall("BFVrns_Encryption/n32768", lambda: ctx.encrypt(pk, m, r),
           iters=3, ref_us=2370.0)
    ct = ctx.encrypt(pk, m, r)
    s.wall("BFVrns_Decryption/n32768", lambda: ctx.decrypt(sk, ct),
           iters=3, ref_us=335.0)

    s.device("BFVrns_Add/n32768",
             lambda c: ctx.add(c, ct), ct, k=3, iters=3)
    s.device("BFVrns_MultRelin/n32768",
             lambda c: ctx.mul(c, ct, evk), ct,
             k=3, iters=3, ref_us=3021.0)
    s.device("BFVrns_MultRelin_behz/n32768",
             lambda c: ctx.mul(c, ct, evk, technique="behz"), ct,
             k=3, iters=3, ref_us=3021.0)


def _bgv(s: Suite):
    from fhe_tpu.pke import bgv
    from fhe_tpu.lattice import rns

    N = 1 << 13
    r = mkrng(3)
    ctx = bgv.BgvContext.create(N=N, num_levels=4, plain_mod=65537, dnum=2)
    s.wall("BGVrns_KeyGen/n8192", lambda: ctx.keygen(r), iters=1)
    sk, pk = ctx.keygen(r)
    evk = ctx.relin_key_gen(sk, r)
    m = r.integers(0, 65537, size=N)
    s.wall("BGVrns_Encryption/n8192", lambda: ctx.encrypt(pk, m, r),
           iters=3)
    ct = ctx.encrypt(pk, m, r)
    s.wall("BGVrns_Decryption/n8192", lambda: ctx.decrypt(sk, ct),
           iters=3)

    mods = tuple(ct.c0.moduli)

    def as_ct(x):
        return bgv.Ciphertext(rns.RnsPoly(x, mods, rns.EVAL),
                              rns.RnsPoly(x, mods, rns.EVAL),
                              pt_scale=ct.pt_scale)

    s.device("BGVrns_Add/n8192",
             lambda x: ctx.add(as_ct(x), ct).c0.data, ct.c0.data)
    s.device("BGVrns_MultRelin/n8192",
             lambda x: ctx.mul(as_ct(x), ct, evk).c0.data, ct.c0.data,
             ref_us=1564.0)


def run() -> Suite:
    s = Suite("lib")
    for fn in (_ckks, _bfv, _bgv):
        if s.over_budget():
            s.add(f"skipped_{fn.__name__}", None, note="suite budget")
            continue
        try:
            fn(s)
        except Exception as e:  # noqa: BLE001
            import sys
            print(f"# lib/{fn.__name__} failed: {e!r}", file=sys.stderr)
    return s
