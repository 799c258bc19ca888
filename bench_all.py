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


def timed_diff(step, init, k=5, iters=8):
    """Pure DEVICE time of one `step` application, by differencing
    dependent chains: time a jitted scan whose body applies `step` k
    times vs once, and report (t_k - t_1)/(k-1).

    This cancels BOTH the per-call dispatch overhead and the ~1.3 ms
    per-scan-iteration floor measured on the tunneled TPU runtime --
    naive per-call timing overstates sub-ms ops by 10-100x.  The
    reference baselines are pure-compute CPU times, so this is the
    apples-to-apples number."""
    from jax import lax

    def run(kk):
        def body(c, _):
            for _i in range(kk):
                c = step(c)
            return c, None
        f = jax.jit(lambda c: lax.scan(body, c, None, length=iters)[0])
        out = f(init)
        jax.block_until_ready(jax.tree.leaves(out))
        t0 = time.perf_counter()
        out = f(init)
        jax.block_until_ready(jax.tree.leaves(out))
        return (time.perf_counter() - t0) / iters

    t1 = run(1)
    tk = run(k)
    dt = (tk - t1) / (k - 1)
    # below ~2 us the k-vs-1 difference is timer noise; report unmeasurable
    # instead of clamping to a bogus tiny value (a 0.0 ms metric with a
    # 10^6 x vs_baseline is garbage-in for any downstream artifact)
    return None if dt < 2e-6 else dt


def _ms(dt):
    return None if dt is None else dt * 1e3


def emit(metric, ms, baseline_ms):
    if ms is None:
        print(json.dumps({
            "metric": metric, "value": None, "unit": "ms",
            "note": "below measurement noise floor (< 2 us/op)",
            "backend": jax.default_backend(),
        }), flush=True)
        return
    print(json.dumps({
        "metric": metric, "value": round(ms, 4), "unit": "ms",
        "vs_baseline": round(baseline_ms / ms, 3),
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
    import jax.numpy as jnp2
    mods = tuple(ctx.params.moduli)

    def step(c):
        out = ctx.rescale(ctx.mul(c, c, evk))
        # restore the dropped limb so the chain's shapes close (timing only)
        p0 = jnp2.concatenate([out.c0.data, out.c0.data[-1:]], axis=0)
        p1 = jnp2.concatenate([out.c1.data, out.c1.data[-1:]], axis=0)
        return ckks.Ciphertext(rns.RnsPoly(p0, mods, rns.EVAL),
                               rns.RnsPoly(p1, mods, rns.EVAL), ct.scale)

    ms = _ms(timed_diff(step, ct, k=5))
    emit(f"ckks_mult_relin_rescale_n{N}_l8", ms, 1.803)
    f = jax.jit(lambda c, k: ctx.rescale(ctx.mul(c, c, k)))
    ms = timed(lambda: f(ct, evk), iters=20) * 1e3
    emit(f"ckks_mult_relin_rescale_n{N}_l8_wall_dispatch", ms, 1.803)
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
    ms = _ms(timed_diff(lambda c: ctx.mul(c, c, evk), c1, k=3, iters=4))
    emit(f"bfv_mult_relin_n{N}", ms, 3.021)


def bench_threshold_ckks():
    """Config 5: 3-of-5-style threshold CKKS decrypt (lead + 4 mains +
    fusion).  Reference CPU: ~50 ms 3-of-5 combine (README.md:143)."""
    small = os.environ.get("FHE_BENCH_SMALL") == "1"
    N = 1 << (10 if small else 12)
    ctx = ckks.CkksContext.create(N=N, num_levels=4, scale_bits=26, dnum=2)
    rng = np.random.default_rng(3)
    sks, pk = multiparty.multiparty_keygen(ctx.params, 5, rng)
    z = rng.normal(size=N // 2)
    ct = ctx.encrypt(pk, z, rng)

    # whole-protocol single compiled pipeline (lead + 4 mains + fusion)
    import jax.numpy as jnp2
    mods = tuple(ct.c0.moduli)
    s_stack = jnp2.stack([sk.eval_poly(mods).data for sk in sks])
    pfn = multiparty._pipeline_fn(mods, N, 1, 5, multiparty.MP_SD)
    key0 = jax.random.key(7)

    def step(c1_data):
        ph = pfn(s_stack, ct.c0.data, c1_data, key0)
        return rns.to_eval(rns.RnsPoly(ph, mods, rns.COEFF)).data

    ms = _ms(timed_diff(step, ct.c1.data, k=4, iters=4))
    emit(f"threshold_ckks_5party_n{N}", ms, 50.0)
    got = multiparty.threshold_decrypt_pipeline(
        ctx.params, sks, ct.c0, ct.c1, np.random.default_rng(5))
    big = rns.to_bigint(got)
    Q = 1
    for q in ct.moduli:
        Q *= q
    val = ckks.decode(ckks._center(big, Q), N, ct.scale)
    assert np.abs(val.real - z).max() < 0.8, "threshold decrypt wrong"


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
        dt = timed_diff(lambda v: nttmod.ntt_forward(plan, v), x,
                        k=5, iters=6)
        ms = None if dt is None else dt * 1e3 / B
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
        ms = _ms(timed_diff(lambda c, t=tech: ctx.mul(c, c, evk, technique=t),
                         c1, k=3, iters=4))
        emit(f"bfv_mult_relin_{tech}_n{N}", ms, 3.021)


if __name__ == "__main__":
    ensure_backend()
    bench_ckks_mult_rescale()
    bench_bfv_dot()
    bench_threshold_ckks()
    bench_ntt_sizes()
    bench_bfv_mult_methods()
