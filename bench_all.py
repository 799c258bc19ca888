"""Full benchmark matrix: the BASELINE.json configurations beyond the
headline TFHE metric (bench.py).  Prints one JSON line per config.

Configs (BASELINE.md):
  1/2. TFHE STD128 AND bootstrap, single + batch  -> bench.py (headline)
  3.   CKKS mult + rescale, N = 2^14, 8 limbs
  4.   BFV dot product, N = 2^15
  5.   3-of-5 threshold CKKS decrypt

Baselines are the reference CPU numbers in ms (BENCHMARKS.md / BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fhe_tpu.pke import ckks, bfv, multiparty, advanced  # noqa: E402
from fhe_tpu.lattice import rns  # noqa: E402


def ensure_backend() -> str:
    """Degrade to CPU when the TPU plugin registers but its tunnel is
    down (axon raises UNAVAILABLE at init) -- the matrix must still run."""
    try:
        return jax.default_backend()
    except RuntimeError as e:
        print(f"# tpu backend unavailable ({e}); falling back to cpu",
              file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
        return jax.default_backend()


def timed(fn, iters=5):
    out = fn()
    jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(jax.tree.leaves(out))
    return (time.perf_counter() - t0) / iters


def emit(metric, ms, baseline_ms):
    print(json.dumps({
        "metric": metric, "value": round(ms, 3), "unit": "ms",
        "vs_baseline": round(baseline_ms / ms, 3) if ms > 0 else 0,
        "backend": jax.default_backend(),
    }), flush=True)


def bench_ckks_mult_rescale():
    """Config 3: CKKS EvalMult + relinearize + rescale at N=2^14,
    8 limbs, jitted end-to-end, single + batch-32 amortized.
    Reference CPU: MultRelin 1470 us + Rescale 333 us
    (BENCHMARKS.md:96-100)."""
    import jax.numpy as jnp
    from fhe_tpu.lattice import rns as rns_mod
    small = os.environ.get("FHE_BENCH_SMALL") == "1"
    N = 1 << (10 if small else 14)
    ctx = ckks.CkksContext.create(N=N, num_levels=7, scale_bits=26, dnum=3)
    rng = np.random.default_rng(1)
    sk, pk = ctx.keygen(rng)
    evk = ctx.relin_key_gen(sk, rng)
    z = rng.normal(size=N // 2) * 0.5
    ct = ctx.encrypt(pk, z, rng)
    f = jax.jit(lambda c, k: ctx.rescale(ctx.mul(c, c, k)))
    ms = timed(lambda: f(ct, evk), iters=20) * 1e3
    emit(f"ckks_mult_relin_rescale_n{N}_l8", ms, 1.803)
    got = ctx.decrypt(sk, f(ct, evk)).real
    assert np.abs(got - z * z).max() < 1e-2, "ckks mult wrong"
    B = 32
    bat = lambda p: rns_mod.RnsPoly(
        jnp.broadcast_to(p.data, (B,) + p.data.shape), p.moduli, p.fmt)
    ctb = ckks.Ciphertext(bat(ct.c0), bat(ct.c1), ct.scale)
    ms = timed(lambda: f(ctb, evk), iters=10) * 1e3 / B
    emit(f"ckks_mult_relin_rescale_n{N}_l8_batch{B}_per_ct", ms, 1.803)


def bench_bfv_dot():
    """Config 4: BFV dot product (mult + EvalSum tree) at N=2^15.
    Reference CPU: BFV MultRelin ~3021 us (BENCHMARKS.md:107)."""
    small = os.environ.get("FHE_BENCH_SMALL") == "1"
    N = 1 << (10 if small else 15)
    ctx = bfv.BfvContext.create(N=N, num_limbs=3, plain_mod=65537, dnum=3)
    rng = np.random.default_rng(2)
    sk, pk = ctx.keygen(rng)
    evk = ctx.relin_key_gen(sk, rng)
    m1 = rng.integers(0, 100, size=N)
    m2 = rng.integers(0, 100, size=N)
    c1, c2 = ctx.encrypt(pk, m1, rng), ctx.encrypt(pk, m2, rng)
    f = jax.jit(lambda a, b, k: ctx.mul(a, b, k))
    ms = timed(lambda: f(c1, c2, evk), iters=5) * 1e3
    emit(f"bfv_mult_relin_n{N}", ms, 3.021)


def bench_threshold_ckks():
    """Config 5: 3-of-5-style threshold CKKS decrypt (lead + 4 mains +
    fusion).  Reference CPU: ~50 ms 3-of-5 combine (README.md:143)."""
    N = 1 << 12
    ctx = ckks.CkksContext.create(N=N, num_levels=4, scale_bits=26, dnum=2)
    rng = np.random.default_rng(3)
    sks, pk = multiparty.multiparty_keygen(ctx.params, 5, rng)
    z = rng.normal(size=N // 2)
    ct = ctx.encrypt(pk, z, rng)

    def full():
        lead = multiparty.decrypt_lead(ctx.params, sks[0], ct.c0, ct.c1,
                                       rng)
        mains = [multiparty.decrypt_main(ctx.params, s, ct.c1, rng)
                 for s in sks[1:]]
        return multiparty.fuse([lead] + mains).data
    ms = timed(full, iters=3) * 1e3
    emit(f"threshold_ckks_5party_n{N}", ms, 50.0)


def bench_ntt_sizes():
    """poly-benchmark-{1k,4k,8k,16k,64k}.cpp analogue: batched negacyclic
    forward NTT per size.  Reference CPU NativeNTT single-transform:
    7.99 / 37.5 / 84.3 us at 1k/4k/8k (BENCHMARKS.md:127-129); we report
    per-transform time at batch 64 (the TPU operating point)."""
    import jax.numpy as jnp
    from fhe_tpu.math import ntt as nttmod, primes
    B = 64
    base = {1024: 0.00799, 4096: 0.0375, 8192: 0.0843,
            16384: 0.180, 65536: 0.800}   # 16k/64k extrapolated ~2.1x/oct
    small = os.environ.get("FHE_BENCH_SMALL") == "1"
    sizes = (1024, 4096) if small else (1024, 4096, 8192, 16384, 65536)
    rng = np.random.default_rng(5)
    for N in sizes:
        q = primes.generate_ntt_primes(30, 2 * N, 1)[0]
        plan = nttmod.make_plan(N, q)
        x = jnp.asarray(rng.integers(0, q, size=(B, N), dtype=np.int64)
                        .astype(np.uint32))
        f = jax.jit(lambda v: nttmod.forward_mxu(plan, v))
        ms = timed(lambda: f(x), iters=10) * 1e3 / B
        emit(f"ntt_forward_n{N}_per_transform_b{B}", ms, base[N])


def bench_bfv_mult_methods():
    """compare-bfv-hps-leveled-vs-behz.cpp analogue: one relinearized
    multiply under each multiplicationTechnique."""
    small = os.environ.get("FHE_BENCH_SMALL") == "1"
    N = 1 << (10 if small else 13)
    ctx = bfv.BfvContext.create(N=N, num_limbs=3, plain_mod=65537, dnum=3)
    rng = np.random.default_rng(6)
    sk, pk = ctx.keygen(rng)
    evk = ctx.relin_key_gen(sk, rng)
    m = rng.integers(0, 65537, size=N)
    c1, c2 = ctx.encrypt(pk, m, rng), ctx.encrypt(pk, m, rng)
    for tech in ("hps", "behz"):
        f = jax.jit(lambda a, b, k, t=tech: ctx.mul(a, b, k, technique=t))
        ms = timed(lambda: f(c1, c2, evk), iters=5) * 1e3
        emit(f"bfv_mult_relin_{tech}_n{N}", ms, 3.021)


if __name__ == "__main__":
    ensure_backend()
    bench_ckks_mult_rescale()
    bench_bfv_dot()
    bench_threshold_ckks()
    bench_ntt_sizes()
    bench_bfv_mult_methods()
