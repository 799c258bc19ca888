"""CKKS bootstrapping walkthrough: fully packed, sparsely packed, and
sparse-encapsulated (dense secret) pipelines.

Reference analogue: /root/reference/src/pke/examples/
simple-ckks-bootstrapping.cpp and advanced-ckks-bootstrapping.cpp
(sparse packing).  Run: python examples/ckks_bootstrapping.py
"""
import _common  # noqa: F401

import numpy as np

from fhe_tpu.pke import ckks, bootstrap
from fhe_tpu.lattice import rns

N, H = 128, 16


def exhaust(ctx, ct):
    """Drop to the base block: no multiplications left."""
    drop = len(ct.moduli) - ctx.cd
    return ckks.Ciphertext(rns.level_reduce(ct.c0, drop),
                           rns.level_reduce(ct.c1, drop), ct.scale)


def main():
    ctx = ckks.CkksContext.create(N=N, num_levels=13, scale_bits=52,
                                  dnum=2, composite_degree=2)
    rng = np.random.default_rng(1)

    # ---- fully packed, sparse-ternary secret -------------------------------
    sk, pk = ctx.keygen(rng, h=H)
    pre = bootstrap.setup(ctx, h=H)
    keys = bootstrap.keygen(ctx, sk, pre, rng)
    z = rng.uniform(-0.4, 0.4, size=N // 2)
    out = bootstrap.eval_bootstrap(ctx, exhaust(ctx, ctx.encrypt(pk, z, rng)),
                                   pre, keys)
    err = np.abs(ctx.decrypt(sk, out).real - z).max()
    print(f"full packing:     levels {ctx.cd} -> {len(out.moduli)}, "
          f"err {err:.2e}")

    # ---- sparsely packed (slots = 8 < N/2) ---------------------------------
    s = 8
    pre_s = bootstrap.setup(ctx, h=H, slots=s)
    keys_s = bootstrap.keygen(ctx, sk, pre_s, rng)
    zs = rng.uniform(-0.4, 0.4, size=s) + 1j * rng.uniform(-0.4, 0.4, size=s)
    ct = exhaust(ctx, ctx.encrypt(pk, zs, rng, slots=s))
    out_s = bootstrap.eval_bootstrap(ctx, ct, pre_s, keys_s)
    err_s = np.abs(ctx.decrypt(sk, out_s, slots=s, sparse=True) - zs).max()
    print(f"sparse packing:   slots {s}, K {pre_s.K}, err {err_s:.2e}")

    # ---- sparse-encapsulated: DENSE secret, sparse helper for the raise ----
    skd, pkd = ctx.keygen(rng)              # uniform ternary
    keys_e = bootstrap.keygen(ctx, skd, pre, rng, encapsulate_h=H)
    out_e = bootstrap.eval_bootstrap(
        ctx, exhaust(ctx, ctx.encrypt(pkd, z, rng)), pre, keys_e)
    err_e = np.abs(ctx.decrypt(skd, out_e).real - z).max()
    print(f"sparse-encap:     dense secret, helper h={H}, err {err_e:.2e}")


if __name__ == "__main__":
    main()
