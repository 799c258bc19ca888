"""Slot-matrix aggregation: EvalSum, EvalSumRows/Cols, EvalMerge,
inner products, rotations.

Reference analogue: /root/reference/src/pke/examples/inner-product.cpp,
rotation.cpp (+ base-advancedshe EvalSumRows/Cols/Merge).
Run: python examples/matrix_slot_ops.py
"""
import _common  # noqa: F401

import numpy as np

from fhe_tpu.pke import ckks, advanced

N = 256
SLOTS = N // 2


def main():
    ctx = ckks.CkksContext.create(N=N, num_levels=8, scale_bits=26, dnum=2)
    rng = np.random.default_rng(11)
    sk, pk = ctx.keygen(rng)
    evk = ctx.relin_key_gen(sk, rng)

    # ---- rotations --------------------------------------------------------
    z = rng.normal(size=SLOTS)
    rot_keys = ctx.rotation_key_gen(sk, [1, 2, -1], rng)
    ct = ctx.encrypt(pk, z, rng)
    for r in (1, 2, -1):
        got = ctx.decrypt(sk, ctx.rotate(ct, r, rot_keys)).real
        print(f"rotate {r:+d}:      max err "
              f"{np.abs(got - np.roll(z, -r)).max():.2e}")

    # ---- inner product ----------------------------------------------------
    sum_keys = advanced.sum_key_gen(ctx, sk, rng)
    z2 = rng.normal(size=SLOTS)
    ip = advanced.eval_inner_product(ctx, ct, ctx.encrypt(pk, z2, rng),
                                     SLOTS, evk, sum_keys)
    print(f"inner product:  {ctx.decrypt(sk, ip).real[0]:+.4f} "
          f"(want {z @ z2:+.4f})")

    # ---- matrix row/col sums ----------------------------------------------
    rows, cols = 8, SLOTS // 8
    M = rng.normal(size=(rows, cols))
    ctm = ctx.encrypt(pk, M.reshape(-1), rng)
    rk = advanced.sum_rows_key_gen(ctx, sk, rng, cols)
    got = ctx.decrypt(sk, advanced.eval_sum_rows(ctx, ctm, cols, rk)).real
    print(f"EvalSumRows:    max err "
          f"{np.abs(got[:cols] - M.sum(axis=0)).max():.2e}")

    ck = advanced.sum_cols_key_gen(ctx, sk, rng, cols)
    got = ctx.decrypt(sk, advanced.eval_sum_cols(ctx, ctm, cols, ck)).real
    want = np.repeat(M.sum(axis=1), cols)
    print(f"EvalSumCols:    max err {np.abs(got - want).max():.2e}")

    # ---- merge slot 0 of several ciphertexts ------------------------------
    vals = [rng.normal(size=SLOTS) for _ in range(4)]
    cts = [ctx.encrypt(pk, v, rng) for v in vals]
    mk = advanced.merge_key_gen(ctx, sk, rng, 4)
    got = ctx.decrypt(sk, advanced.eval_merge(ctx, cts, mk)).real
    print(f"EvalMerge:      first 4 slots "
          f"{np.round(got[:4], 3).tolist()} "
          f"(want {np.round([v[0] for v in vals], 3).tolist()})")


if __name__ == "__main__":
    main()
