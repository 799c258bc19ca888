"""Polynomial-arithmetic microbenchmarks.

Mirrors the reference's poly-benchmark-{1k,4k,8k,16k,64k}.cpp
(/root/reference/benchmark/src/poly-benchmark.h:372-401: Native_/DCRT_
AddEq, SubEq, MulEq, ntt, intt, CRTInterpolate, BaseDecompose), re-cast
for the TPU:

- "Native" = one 31-bit NTT prime, uint32 tensors, the lane-factored
  MXU NTT (the default device path).
- "DCRT" = RnsPoly with L towers (the reference sweeps towers via
  DCRTArguments); ops run batched over the limb axis in one device
  computation.
- Every case runs over a BATCH of 128 polynomials and reports the
  per-polynomial time (dt / 128): single-poly device times are sub-µs
  to µs-scale, far below the tunneled runtime's measurement noise, and
  batching is how the TPU is actually used (the reference's own Metal
  NTT benchmarks batch 32/128 for the same reason, BENCHMARKS.md:47-52).
- CRTInterpolate composes to multiprecision on the host (our decrypt
  path does the same; reported as wall time with a host note).

Device times come from dependent-chain differencing (core.timed_diff).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .core import Suite, rng as mkrng


SIZES = (1 << 10, 1 << 12, 1 << 13, 1 << 14, 1 << 16)
TOWERS = (2, 4, 8)
B = 128


def run(sizes=SIZES, towers=TOWERS) -> Suite:
    from fhe_tpu.math import ntt as nttmod, primes, modmath
    from fhe_tpu.lattice import rns

    s = Suite("poly")
    r = mkrng()

    for N in sizes:
        if s.over_budget():
            s.add(f"skipped_from_n{N}", None, note="suite budget")
            break
        q = primes.generate_ntt_primes(30, 2 * N, 1)[0]
        plan = nttmod.make_plan(N, q)
        a = jnp.asarray(r.integers(0, q, size=(B, N), dtype=np.int64)
                        .astype(np.uint32))
        qj = jnp.uint32(q)
        qinv = modmath.mont_constants(q)[0]
        per = dict(batch=B, note=f"per poly, batch {B}")

        # Native_AddEq / SubEq / MulEq (poly-benchmark.h:372-382)
        s.device(f"Native_AddEq/n{N}_b{B}",
                 lambda x: modmath.add_mod(x, a, qj), a, scale=B, **per)
        s.device(f"Native_SubEq/n{N}_b{B}",
                 lambda x: modmath.sub_mod(x, a, qj), a, scale=B, **per)
        s.device(f"Native_MulEq/n{N}_b{B}",
                 lambda x: modmath.mont_mul(x, a, qj, jnp.uint32(qinv)),
                 a, scale=B, **per)
        # Native_ntt / intt (:385,387): lane-factored MXU NTT, natural
        # order in/out.  M1 Max CPU: 7.99/37.5/84.3 us at 1k/4k/8k
        # (reference BENCHMARKS.md:127-129)
        ref_ntt = {1 << 10: 7.99, 1 << 12: 37.5, 1 << 13: 84.3}.get(N)
        s.device(f"Native_ntt/n{N}_b{B}",
                 lambda x: nttmod.forward_lane_natural(plan, x), a,
                 scale=B, ref_us=ref_ntt, **per)
        s.device(f"Native_intt/n{N}_b{B}",
                 lambda x: nttmod.inverse_lane_natural(plan, x), a,
                 scale=B, ref_us=ref_ntt, **per)

        for L in towers:
            if s.over_budget():
                break
            mods = tuple(primes.generate_ntt_primes(30, 2 * N, L))
            pdata = jnp.asarray(np.stack(
                [r.integers(0, m, size=(B, N), dtype=np.int64)
                 for m in mods], axis=-2).astype(np.uint32))  # [B, L, N]
            p = rns.RnsPoly(pdata, mods, rns.EVAL)

            s.device(f"DCRT_AddEq/n{N}_t{L}_b{B}",
                     lambda x: rns.add(rns.RnsPoly(x, mods, rns.EVAL),
                                       p).data, pdata, scale=B, **per)
            s.device(f"DCRT_MulEq/n{N}_t{L}_b{B}",
                     lambda x: rns.mul(rns.RnsPoly(x, mods, rns.EVAL),
                                       p).data, pdata, scale=B, **per)
            s.device(f"DCRT_ntt/n{N}_t{L}_b{B}",
                     lambda x: rns.to_eval(
                         rns.RnsPoly(x, mods, rns.COEFF)).data, pdata,
                     scale=B, **per)
            s.device(f"DCRT_intt/n{N}_t{L}_b{B}",
                     lambda x: rns.to_coeff(
                         rns.RnsPoly(x, mods, rns.EVAL)).data, pdata,
                     scale=B, **per)

            # DCRT_BaseDecompose (:400): the HYBRID digit split + ModUp
            # analogue — switch the first half's limbs into the full basis.
            if L >= 2:
                half = mods[:L // 2]
                s.device(
                    f"DCRT_ApproxSwitchCRTBasis/n{N}_t{L // 2}to{L}_b{B}",
                    lambda x: rns.switch_crt_basis_approx(
                        rns.RnsPoly(x[:, :len(half)], half, rns.COEFF),
                        mods).data, pdata, scale=B, **per)

        # CRTInterpolate (:394): host CRT composition (decrypt tail)
        if N <= (1 << 14):
            mods4 = tuple(primes.generate_ntt_primes(30, 2 * N, 4))
            pd = np.stack([r.integers(0, m, size=N, dtype=np.int64)
                           for m in mods4]).astype(np.uint32)
            pp = rns.RnsPoly(jnp.asarray(pd), mods4, rns.COEFF)
            s.wall(f"DCRT_CRTInterpolate/n{N}_t4",
                   lambda: rns.to_bigint(pp) is not None, iters=3,
                   note="host CRT composition (decrypt tail)")
    return s
