"""Iterative (META-BTS) CKKS bootstrapping (reference:
iterative-ckks-bootstrapping.cpp): a second bootstrap of the amplified
error roughly doubles the output precision of a single bootstrap."""
import _common  # noqa: F401
import numpy as np
from fhe_tpu.lattice import rns
from fhe_tpu.pke import bootstrap, ckks

N, H = 128, 16

ctx = ckks.CkksContext.create(N=N, num_levels=13, scale_bits=52,
                              dnum=2, composite_degree=2)
rng = np.random.default_rng(5)
sk, pk = ctx.keygen(rng, h=H)
pre = bootstrap.setup(ctx, h=H)
keys = bootstrap.keygen(ctx, sk, pre, rng)

z = rng.uniform(-0.4, 0.4, size=N // 2)
ct = ctx.encrypt(pk, z, rng)
drop = len(ct.moduli) - ctx.cd
ct = ckks.Ciphertext(rns.level_reduce(ct.c0, drop),
                     rns.level_reduce(ct.c1, drop), ct.scale)

b1 = bootstrap.eval_bootstrap(ctx, ct, pre, keys)
e1 = np.abs(ctx.decrypt(sk, b1).real - z).max()

b2 = bootstrap.eval_bootstrap_iterative(ctx, ct, pre, keys,
                                        precision_bits=6)
e2 = np.abs(ctx.decrypt(sk, b2).real - z).max()

print(f"single bootstrap error    {e1:.3e}  (~{-np.log2(e1):.1f} bits)")
print(f"iterative (2x) error      {e2:.3e}  (~{-np.log2(e2):.1f} bits)")
assert e2 < e1
print("META-BTS precision gain: OK")
