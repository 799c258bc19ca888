"""Exact integer arithmetic with BGV and BFV: SIMD packing, depth chains,
dot products.

Reference analogue: /root/reference/src/pke/examples/simple-integers.cpp,
simple-integers-bgvrns.cpp, depth-bfvrns.cpp, depth-bgvrns.cpp.
Run: python examples/simple_integers.py
"""
import _common  # noqa: F401

import numpy as np

from fhe_tpu.pke import bgv, bfv

N = 256
T = 65537


def main():
    rng = np.random.default_rng(13)

    # ---- BFV: packed add/mul/dot -----------------------------------------
    ctx = bfv.BfvContext.create(N=N, num_limbs=4, plain_mod=T, mod_bits=28)
    sk, pk = ctx.keygen(rng)
    evk = ctx.relin_key_gen(sk, rng)
    m1 = rng.integers(0, 100, size=N)
    m2 = rng.integers(0, 100, size=N)
    c1, c2 = ctx.encrypt(pk, m1, rng), ctx.encrypt(pk, m2, rng)
    s = np.asarray(ctx.decrypt(sk, ctx.add(c1, c2)))
    p = np.asarray(ctx.decrypt(sk, ctx.mul(c1, c2, evk)))
    print("BFV add exact: ", bool((s == (m1 + m2) % T).all()),
          " mul exact:", bool((p == (m1 * m2) % T).all()))

    # depth chain: ((m^2)^2) = m^4
    c = ctx.mul(c1, c1, evk)
    c = ctx.mul(c, c, evk)
    p4 = np.asarray(ctx.decrypt(sk, c))
    want4 = (m1.astype(object) ** 4 % T).astype(np.int64)
    print("BFV depth-2 m^4:", bool((p4 == want4).all()))

    # ---- BGV: mod-chain arithmetic ---------------------------------------
    bctx = bgv.BgvContext.create(N=N, num_levels=4, plain_mod=T,
                                 mod_bits=28)
    bsk, bpk = bctx.keygen(rng)
    bevk = bctx.relin_key_gen(bsk, rng)
    b1 = bctx.encrypt(bpk, m1, rng)
    b2 = bctx.encrypt(bpk, m2, rng)
    prod = bctx.mod_reduce(bctx.mul(b1, b2, bevk))
    got = np.asarray(bctx.decrypt(bsk, prod))
    print("BGV mul+modreduce exact:", bool((got == (m1 * m2) % T).all()))

    # second level
    prod2 = bctx.mod_reduce(bctx.mul(prod, bctx.mod_reduce(
        bctx.mul(b1, b1, bevk)), bevk))
    got2 = np.asarray(bctx.decrypt(bsk, prod2))
    want2 = (m1.astype(object) ** 3 * m2 % T).astype(np.int64)
    print("BGV depth-2 exact:      ", bool((got2 == want2).all()))

    # ---- BFV dot product (BASELINE config 4 shape, small N) --------------
    plains = [rng.integers(0, 50, size=N) for _ in range(4)]
    cts = [ctx.encrypt(pk, m, rng) for m in plains]
    dot = ctx.dot_product(cts, plains, evk)
    got = np.asarray(ctx.decrypt(sk, dot))
    want = sum(m.astype(object) * m for m in plains) % T
    print("BFV dot product exact:  ",
          bool((got == want.astype(np.int64)).all()))


if __name__ == "__main__":
    main()
