"""Cross-scheme / cross-technique comparison benchmarks.

Mirrors /root/reference/benchmark/src/mult-vs-square.cpp (EvalPo2 with
Mult vs Square), compare-bfv-hps-leveled-vs-behz.cpp (HPS vs BEHZ
multiplication techniques) and compare-bfvrns-vs-bgvrns.cpp (same
workload through BFV and BGV).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .core import Suite, rng as mkrng


def _mult_vs_square(s: Suite):
    from fhe_tpu.pke import ckks, rlwe
    from fhe_tpu.lattice import rns

    N = 1 << 13
    r = mkrng(17)
    ctx = ckks.CkksContext.create(N=N, num_levels=5, scale_bits=26, dnum=2)
    sk, pk = ctx.keygen(r)
    evk = rlwe.prepare_evk(ctx.params, ctx.relin_key_gen(sk, r))
    ct = ctx.encrypt(pk, r.normal(size=N // 2) * 0.3, r)
    mods = tuple(ctx.params.moduli)

    def as_ct(x):
        return ckks.Ciphertext(rns.RnsPoly(x, mods, rns.EVAL),
                               rns.RnsPoly(x, mods, rns.EVAL), ctx.scale)

    s.device("CKKS_EvalPo2_Mult/n8192",
             lambda x: ctx.mul(as_ct(x), as_ct(x), evk).c0.data,
             ct.c0.data)
    s.device("CKKS_EvalPo2_Square/n8192",
             lambda x: ctx.square(as_ct(x), evk).c0.data, ct.c0.data)


def _bfv_vs_bgv(s: Suite):
    from fhe_tpu.pke import bfv, bgv
    from fhe_tpu.lattice import rns

    N = 1 << 13
    r = mkrng(19)

    bctx = bfv.BfvContext.create(N=N, num_limbs=3, plain_mod=65537, dnum=2)
    sk, pk = bctx.keygen(r)
    evk = bctx.relin_key_gen(sk, r)
    m = r.integers(0, 100, size=N)
    bct = bctx.encrypt(pk, m, r)

    s.device("BFVrns_MultRelin_hps/n8192",
             lambda c: bctx.mul(c, bct, evk), bct, k=3, iters=3)
    s.device("BFVrns_MultRelin_behz/n8192",
             lambda c: bctx.mul(c, bct, evk, technique="behz"), bct,
             k=3, iters=3)

    gctx = bgv.BgvContext.create(N=N, num_levels=4, plain_mod=65537,
                                 dnum=2)
    gsk, gpk = gctx.keygen(r)
    gevk = gctx.relin_key_gen(gsk, r)
    gct = gctx.encrypt(gpk, m, r)
    gmods = tuple(gct.c0.moduli)

    def as_bgv(x):
        return bgv.Ciphertext(rns.RnsPoly(x, gmods, rns.EVAL),
                              rns.RnsPoly(x, gmods, rns.EVAL),
                              pt_scale=gct.pt_scale)

    s.device("BGVrns_MultRelin/n8192",
             lambda x: gctx.mul(as_bgv(x), gct, gevk).c0.data,
             gct.c0.data)


def run() -> Suite:
    s = Suite("compare")
    for fn in (_mult_vs_square, _bfv_vs_bgv):
        if s.over_budget():
            s.add(f"skipped_{fn.__name__}", None, note="suite budget")
            continue
        try:
            fn(s)
        except Exception as e:  # noqa: BLE001
            import sys
            print(f"# compare/{fn.__name__} failed: {e!r}", file=sys.stderr)
    return s
