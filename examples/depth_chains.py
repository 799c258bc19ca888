"""Multiplication-depth chains for the exact schemes (reference:
depth-bfvrns.cpp, depth-bfvrns-behz.cpp, depth-bgvrns.cpp): iterated
EvalMult with relinearization, BFV under both HPS and BEHZ
multiplication techniques, BGV down its modulus chain."""
import _common  # noqa: F401
import numpy as np
from fhe_tpu.pke import bfv, bgv

T = 65537
rng = np.random.default_rng(31)

# -- BFV: x^4 by repeated squaring, HPS vs BEHZ ---------------------------
ctx = bfv.BfvContext.create(N=256, num_limbs=3, plain_mod=T, mod_bits=28,
                            dnum=2)
sk, pk = ctx.keygen(rng)
evk = ctx.relin_key_gen(sk, rng)
m = rng.integers(0, T, size=256)
want = (m.astype(object) ** 4) % T
for technique in ("hps", "behz"):
    ct = ctx.encrypt(pk, m, rng)
    sq = ctx.mul(ct, ct, evk, technique=technique)
    quad = ctx.mul(sq, sq, evk, technique=technique)
    got = np.asarray(ctx.decrypt(sk, quad))
    assert np.array_equal(got.astype(object), want), technique
    print(f"BFV {technique.upper():4s} depth-2 chain (x^4): OK")

# -- BGV: depth-2 chain down the modulus chain ----------------------------
bctx = bgv.BgvContext.create(N=256, num_levels=3, plain_mod=T,
                             mod_bits=28, dnum=2)
bsk, bpk = bctx.keygen(rng)
bevk = bctx.relin_key_gen(bsk, rng)
ct = bctx.encrypt(bpk, m, rng)
sq = bctx.mod_reduce(bctx.mul(ct, ct, bevk))
quad = bctx.mod_reduce(bctx.mul(sq, sq, bevk))
got = np.asarray(bctx.decrypt(bsk, quad))
assert np.array_equal(got.astype(object), want)
print(f"BGV depth-2 chain: OK (levels left: {len(quad.moduli)})")
