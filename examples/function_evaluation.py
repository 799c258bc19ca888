"""Function evaluation on CKKS ciphertexts: polynomial, Chebyshev series,
and the convenience wrappers (logistic, divide, sin, cos).

Reference analogue: /root/reference/src/pke/examples/
function-evaluation.cpp, polynomial-evaluation.cpp,
linearwsum-evaluation.cpp (+ FUNCTION_EVALUATION.md).
Run: python examples/function_evaluation.py
"""
import _common  # noqa: F401

import numpy as np

from fhe_tpu.pke import ckks, advanced

N = 256


def main():
    ctx = ckks.CkksContext.create(N=N, num_levels=8, scale_bits=26, dnum=2)
    rng = np.random.default_rng(7)
    sk, pk = ctx.keygen(rng)
    evk = ctx.relin_key_gen(sk, rng)
    slots = N // 2

    # ---- power-basis polynomial (EvalPoly) -------------------------------
    z = rng.uniform(-0.9, 0.9, size=slots)
    ct = ctx.encrypt(pk, z, rng)
    coeffs = [0.15, 0.75, 0, 1.25, 0, 1]      # as in polynomial-evaluation
    got = ctx.decrypt(sk, advanced.eval_poly(ctx, ct, coeffs, evk)).real
    want = np.polyval(coeffs[::-1], z)
    print(f"EvalPoly deg-5:      max err {np.abs(got - want).max():.2e}")

    # ---- Chebyshev series, Paterson-Stockmeyer ---------------------------
    got = ctx.decrypt(sk, advanced.eval_chebyshev_function(
        ctx, lambda x: np.exp(x), ct, -1, 1, 16, evk)).real
    print(f"EvalChebyshev exp:   max err {np.abs(got - np.exp(z)).max():.2e}")

    # ---- logistic / divide / sin / cos -----------------------------------
    z4 = rng.uniform(-4, 4, size=slots)
    ct4 = ctx.encrypt(pk, z4, rng)
    got = ctx.decrypt(sk, advanced.eval_logistic(ctx, ct4, -5, 5, 16,
                                                 evk)).real
    print(f"EvalLogistic:        max err "
          f"{np.abs(got - 1 / (1 + np.exp(-z4))).max():.2e}")

    zp = rng.uniform(1, 3, size=slots)
    ctp = ctx.encrypt(pk, zp, rng)
    got = ctx.decrypt(sk, advanced.eval_divide(ctx, ctp, 0.8, 3.2, 24,
                                               evk)).real
    print(f"EvalDivide 1/x:      max err {np.abs(got - 1 / zp).max():.2e}")

    got = ctx.decrypt(sk, advanced.eval_sin(ctx, ct, -1.5, 1.5, 12,
                                            evk)).real
    print(f"EvalSin:             max err {np.abs(got - np.sin(z)).max():.2e}")

    # ---- linear weighted sum (EvalLinearWSum) ----------------------------
    zs = [rng.normal(size=slots) for _ in range(3)]
    ws = [0.25, -0.5, 1.5]
    cts = [ctx.encrypt(pk, zz, rng) for zz in zs]
    got = ctx.decrypt(sk, advanced.eval_linear_wsum(ctx, cts, ws)).real
    want = sum(w * zz for w, zz in zip(ws, zs))
    print(f"EvalLinearWSum:      max err {np.abs(got - want).max():.2e}")


if __name__ == "__main__":
    main()
