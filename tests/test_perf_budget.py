"""Performance-budget regression tests (the reference's
src/binfhe/unittest/perf_benchmarks.cpp pattern: gtest-integrated
latency thresholds that fail CI when a code change regresses a hot
path — "prevents optimizations that improve one path but regress
another").

Budgets here are calibrated for the CI operating point: the jitted
fast paths on a single-core CPU backend (tests force jax_platforms=cpu;
real-TPU numbers live in bench.py / bench_all.py).  They are set ~5-10x
above measured so they only trip on structural regressions — an
un-jitted eager fallback, a tracer leak re-materializing plans per call
(the class of bug fixed in commit 92217f3: 2525 ms eager vs 3.5 ms
jitted), or an accidental gather/dynamic-shape path.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

TOLERANCE = 1.20  # reference perf_limits::TOLERANCE_PCT = 20%


def measure_ms(fn, iters=5, warmup=2):
    """Min-of-iters latency of a device computation, post-warmup
    (warmup absorbs jit compilation, like the reference's warmup loop)."""
    for _ in range(warmup):
        jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def check_budget(name, ms, budget_ms):
    limit = budget_ms * TOLERANCE
    print(f"[perf] {name}: {ms:.2f} ms (budget {budget_ms} ms)")
    assert ms <= limit, f"{name}: {ms:.2f} ms > budget {limit:.2f} ms"


def test_ntt_4096_budget(rng):
    """NTT_4096_BATCH_{1,32} analogue: the jitted MXU NTT must stay a
    single fused device computation."""
    from fhe_tpu.math import ntt as nttmod, primes
    q = primes.generate_ntt_primes(30, 8192, 1)[0]
    plan = nttmod.make_plan(4096, q)
    f = jax.jit(lambda v: nttmod.forward_mxu(plan, v))
    # batch-1 costs ~the same as batch-32 here: the int8 MXU NTT is
    # dominated by the N x N factor matmuls, not the batch dimension
    # (measured ~800 ms either way on the 1-core CPU CI backend).
    for batch, budget in ((1, 4000.0), (32, 5000.0)):
        x = jnp.asarray(rng.integers(0, q, size=(batch, 4096),
                                     dtype=np.int64).astype(np.uint32))
        check_budget(f"ntt4096_b{batch}", measure_ms(lambda: f(x)), budget)


def test_mont_mul_budget(rng):
    """BARRETT_100K analogue: 100k+ modular multiplies in one jitted op."""
    from fhe_tpu.math import modmath, primes
    q = primes.generate_ntt_primes(30, 2048, 1)[0]
    qinv = modmath.mont_constants(q)[0]
    a = jnp.asarray(rng.integers(0, q, size=(128, 1024),
                                 dtype=np.int64).astype(np.uint32))
    f = jax.jit(lambda x: modmath.mont_mul(x, x, jnp.uint32(q),
                                           jnp.uint32(qinv)))
    check_budget("mont_mul_131k", measure_ms(lambda: f(a)), 50.0)


def test_ckks_mult_relin_rescale_budget(rng):
    """The leveled-SHE hot path must stay jitted end-to-end
    (CKKS MultRelin budget; guards the 92217f3 tracer-leak class)."""
    from fhe_tpu.pke import ckks
    ctx = ckks.CkksContext.create(N=1024, num_levels=4, scale_bits=26,
                                  dnum=2)
    sk, pk = ctx.keygen(rng)
    evk = ctx.relin_key_gen(sk, rng)
    m = rng.standard_normal(512)  # N/2 slots
    ct = ctx.encrypt(pk, m, rng)
    f = jax.jit(lambda a: ctx.rescale(ctx.mul(a, a, evk)))
    check_budget("ckks_mult_relin_rescale_n1024",
                 measure_ms(lambda: f(ct)), 400.0)


@pytest.mark.slow
def test_pbs_toy_budget(rng):
    """PBS_TOY_SINGLE/BATCH analogue: one jitted batched gate bootstrap.
    Reference CPU budget is 20 ms single / 100 ms batch-8 on M2 Pro;
    our single-core-CPU CI budget is wider but still catches an
    accidentally eager or re-compiling pipeline."""
    from fhe_tpu.tfhe.context import BinFheContext, Gate
    ctx = BinFheContext.generate("TOY")
    sk = ctx.key_gen(rng)
    key = ctx.bt_key_gen(sk, rng)
    bits_a = np.array([0, 1, 0, 1])
    bits_b = np.array([0, 0, 1, 1])
    ca = ctx.encrypt(sk, bits_a, rng)
    cb = ctx.encrypt(sk, bits_b, rng)
    ms = measure_ms(lambda: ctx.eval_bin_gate(key, Gate.AND, ca, cb),
                    iters=3, warmup=1)
    check_budget("pbs_toy_batch4", ms, 30_000.0)
    out = ctx.decrypt(sk, ctx.eval_bin_gate(key, Gate.AND, ca, cb))
    np.testing.assert_array_equal(out, bits_a & bits_b)
