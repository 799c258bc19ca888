"""CKKS functional bootstrapping: arbitrary LUT evaluation over
RLWE-encrypted digits, multi-value bootstrapping, multiprecision sign.

Reference analogue: /root/reference/src/pke/examples/
functional-bootstrapping-ckks.cpp (+ CKKS_FUNCTIONAL_BOOTSTRAPING.md).
Run: python examples/functional_bootstrapping_ckks.py
"""
import _common  # noqa: F401

import numpy as np

from fhe_tpu.pke import ckks, fbt

N, H = 256, 4


def main():
    ctx = ckks.CkksContext.create(N=N, num_levels=18, scale_bits=26,
                                  dnum=3, first_bits=30)
    rng = np.random.default_rng(2)
    sk, pk = ctx.keygen(rng, h=H)
    precom = fbt.setup(ctx, h=H, r=2)
    keys = fbt.keygen(ctx, sk, precom, rng)

    # ---- 1. ArbitraryLUT: f(x) = (x - p/2) mod p over 2-bit digits -------
    p = 4
    big_q = 1 << 33
    func = lambda x: (x % p - p // 2) % p
    coeffs = fbt.get_hermite_trig_coefficients(func, p, order=2)
    msg = rng.integers(0, p, size=N)
    ct = fbt.convert_rlwe_to_ckks(
        ctx, fbt.encrypt_coeff(ctx, sk, msg, big_q, p, rng))
    out = fbt.eval_fbt(ctx, ct, coeffs, precom, keys)
    got = fbt.decrypt_coeff(
        ctx, sk,
        fbt.convert_ckks_to_rlwe(ctx, out, big_q, target_delta=big_q / p),
        p)
    want = np.array([func(int(m)) % p for m in msg])
    print(f"ArbitraryLUT:   {int(np.sum(got == want))}/{N} digits correct")

    # ---- 2. Multi-value bootstrap: two LUTs, one exponential basis -------
    f1 = lambda x: (x * x) % p
    f2 = lambda x: (3 * x + 1) % p
    c1 = fbt.get_hermite_trig_coefficients(f1, p, order=2)
    c2 = fbt.get_hermite_trig_coefficients(f2, p, order=2)
    sp = fbt.eval_mvb_precompute(ctx, ct, precom, keys,
                                 max(len(c1), len(c2)) - 1)
    for name, f, c in [("f1=x^2", f1, c1), ("f2=3x+1", f2, c2)]:
        enc = fbt.eval_mvb_no_decoding(ctx, sp, c, precom, keys)
        o = fbt.eval_hom_decoding(ctx, enc, precom, keys)
        g = fbt.decrypt_coeff(
            ctx, sk,
            fbt.convert_ckks_to_rlwe(ctx, o, big_q, target_delta=big_q / p),
            p)
        w = np.array([f(int(m)) % p for m in msg])
        print(f"MVB {name}:     {int(np.sum(g == w))}/{N} digits correct")

    # ---- 3. Multiprecision sign: 4-bit values via 2-bit digit chain ------
    p_in, p_digit = 16, 4
    Q = big_q << 2                      # Q/p_in == big_q/p_digit
    vals = rng.integers(0, p_in, size=N)
    ct_big = fbt.encrypt_coeff(ctx, sk, vals, Q, p_in, rng)
    sgn = fbt.eval_sign_multiprecision(ctx, ct_big, p_in, p_digit, big_q,
                                       precom, keys, order=2)
    got = fbt.decrypt_coeff(ctx, sk, sgn, 2)
    want = (vals >= p_in // 2).astype(np.int64)
    print(f"MP sign:        {int(np.sum(got == want))}/{N} bits correct")


if __name__ == "__main__":
    main()
