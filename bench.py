"""Driver benchmark: the full BASELINE.json config matrix on the TPU.

Prints one JSON line per config as it completes, and the HEADLINE metric
(batched STD128 TFHE gate bootstraps/sec) LAST with every other metric
embedded under "extra" — so a single parsed JSON object carries the whole
matrix even if only the final line is recorded.

Configs (BASELINE.md "Measured configs"):
  1. STD128 single AND bootstrap (latency)          vs ~10 ms ref CPU
  2. batched STD128 AND bootstraps (throughput)     vs 100 gates/s ref CPU
  3. CKKS mult+relin+rescale N=2^14, 8 limbs        vs 1.803 ms ref CPU
     (single, fused pipeline, + batch-32 amortized per-ct)
  4. BFV mult+relin N=2^15                          vs 3.021 ms ref CPU
  5. 3-of-5-style threshold CKKS decrypt            vs ~50 ms ref CPU

Each config is wrapped so a failure cannot suppress the headline line; a
wall-clock budget (FHE_BENCH_BUDGET seconds, default 1200) skips
remaining PKE configs rather than overrunning the driver, a SIGALRM
watchdog at the budget plus a SIGTERM handler emit the headline-so-far
and exit 0 if anything still overruns, and the gitignored
.bench_cache/xla persistent compile cache makes warm runs complete in a
few minutes.

Device times for sub-ms PKE ops use k-vs-1 scan differencing
(`timed_diff`): the tunneled axon runtime adds a ~1.3 ms per-scan-
iteration floor that plain wall timing cannot separate from the op.
"""

import json
import os
import signal
import sys
import time

import numpy as np
import jax

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

# Persistent XLA compile cache (gitignored): compiled executables
# survive across processes, so the driver's run does not re-pay the
# ~60 s megakernel / multi-minute CKKS pipeline compiles.  (A bootstrap-
# key disk cache was tried and removed: uploading 660 MB of cached keys
# through the tunnel measured SLOWER than the 95 s regeneration.)
CACHE_DIR = os.path.join(_REPO, ".bench_cache")
os.makedirs(CACHE_DIR, exist_ok=True)
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(CACHE_DIR, "xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception as e:  # noqa: BLE001 - cache is best-effort
    print(f"# compilation cache unavailable: {e!r}", file=sys.stderr)

BASELINE_GATES_PER_SEC = 100.0  # reference: ~10 ms/gate, EPYC 7763 1T
T0 = time.monotonic()

# The headline record, set the moment the batched-throughput config is
# measured.  If the driver's timeout (SIGTERM) or a watchdog (SIGALRM)
# fires mid-matrix, the handler prints it WITH whatever extras have
# completed, so the last stdout JSON line is always the headline.
_HEADLINE: dict | None = None
_RESULTS: list = []


def _finalize_headline() -> dict:
    h = dict(_HEADLINE) if _HEADLINE else {
        "metric": "tfhe_std128_and_bootstraps_per_sec", "value": 0.0,
        "unit": "gates/s", "vs_baseline": 0.0, "correct": False,
        "error": "tfhe bench did not complete"}
    h["extra"] = {r["metric"]: {k: v for k, v in r.items() if k != "metric"}
                  for r in _RESULTS}
    return h


def _on_deadline(signum, frame):  # noqa: ARG001
    print(f"# signal {signum}: emitting headline and exiting",
          file=sys.stderr)
    print(json.dumps(_finalize_headline()), flush=True)
    os._exit(0)


for _sig in (signal.SIGTERM, signal.SIGALRM):
    signal.signal(_sig, _on_deadline)


def budget_left() -> float:
    return float(os.environ.get("FHE_BENCH_BUDGET", "1200")) - (
        time.monotonic() - T0)


def _default_backend() -> str:
    """jax.default_backend(), degrading to CPU when the TPU plugin
    registers but its tunnel is down (axon raises UNAVAILABLE at init
    instead of falling through) -- the bench must always print its one
    JSON line."""
    try:
        return jax.default_backend()
    except RuntimeError as e:
        print(f"# tpu backend unavailable ({e}); falling back to cpu",
              file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
        return jax.default_backend()


def emit(rec: dict) -> dict:
    print(json.dumps(rec), flush=True)
    return rec


def timed_diff(step, init, k=3, iters=4):
    """Pure DEVICE time of one `step`: time a jitted scan applying `step`
    k times per iteration vs once, report (t_k - t_1)/(k-1).  Returns
    None (unmeasurable) when the difference is below the timer noise
    floor instead of clamping to a bogus tiny value."""
    from jax import lax

    def run(kk):
        def body(c, _):
            for _i in range(kk):
                c = step(c)
            return c, None
        f = jax.jit(lambda c: lax.scan(body, c, None, length=iters)[0])
        out = f(init)
        jax.block_until_ready(jax.tree.leaves(out))
        best = 1e9
        # min over 4 repeats: the shared tunneled chip sees other
        # tenants' load spikes (100s of ms); a single inflated t_1 would
        # otherwise manufacture a tiny (t_k - t_1) difference
        for _ in range(4):
            t0 = time.perf_counter()
            out = f(init)
            jax.block_until_ready(jax.tree.leaves(out))
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    t1 = run(1)
    tk = run(k)
    dt = (tk - t1) / (k - 1)
    if dt < 2e-6:
        return None
    return dt


def bench_tfhe(results: list):
    """Configs 1-2: STD128 AND gate, batched throughput + single latency."""
    global _HEADLINE
    from fhe_tpu.tfhe import BinFheContext, Gate

    on_tpu = jax.default_backend() == "tpu"
    param_set = os.environ.get("FHE_BENCH_PARAMS", "STD128")
    # b4096 measured 5118 gates/s vs 4974 at b2048 on the lazy megakernel
    # (tile 512): deeper batch amortizes the per-step pipeline overhead
    batch = int(os.environ.get("FHE_BENCH_BATCH",
                               "4096" if on_tpu else "8"))
    iters = int(os.environ.get("FHE_BENCH_ITERS", "3" if on_tpu else "1"))

    ctx = BinFheContext.generate(param_set)
    rng = np.random.default_rng(2026)
    sk = ctx.key_gen(rng)
    print("# tfhe: generating bootstrap key", file=sys.stderr)
    key = ctx.bt_key_gen(sk, rng)

    m1 = rng.integers(0, 2, size=batch)
    m2 = rng.integers(0, 2, size=batch)
    ct1 = ctx.encrypt(sk, m1, rng)
    ct2 = ctx.encrypt(sk, m2, rng)
    # fresh input pair per timing iteration (bench hygiene), and each
    # iteration ends with a scalar device->host read: on the
    # experimental tunneled runtime, block_until_ready alone has been
    # observed to return early (a 786 ms batch "measured" as 0.94 ms);
    # a host read of the result cannot not block.
    pairs = [(ctx.encrypt(sk, m1, rng), ctx.encrypt(sk, m2, rng))
             for _ in range(iters)]
    jax.block_until_ready([p[0].a for p in pairs])

    out = ctx.eval_bin_gate(key, Gate.AND, ct1, ct2)   # compile
    jax.block_until_ready(out)
    print("# tfhe: compiled, timing", file=sys.stderr)
    dts = []
    for c1, c2 in pairs:
        t0 = time.perf_counter()
        out = ctx.eval_bin_gate(key, Gate.AND, c1, c2)
        np.asarray(out.b[:1])
        dts.append(time.perf_counter() - t0)
    # best-of-iters: the tunneled chip is SHARED, so wall time includes
    # other tenants' queueing (observed 0.8 s..4 s for the same batch
    # minutes apart); the minimum approximates unloaded device time
    dt = min(dts)
    got = np.asarray(ctx.decrypt(sk, out, p=4))
    ok = bool(np.array_equal(got, m1 & m2))
    gates_per_sec = batch / dt

    # Publish + emit the headline the moment it exists: any later
    # failure or timeout can no longer lose it (the final line re-emits
    # it with the full extras map).
    _HEADLINE = emit({
        "metric": f"tfhe_{param_set.lower()}_and_bootstraps_per_sec"
                  f"_b{batch}_{jax.default_backend()}",
        "value": round(gates_per_sec, 2),
        "unit": "gates/s",
        "vs_baseline": round(gates_per_sec / BASELINE_GATES_PER_SEC, 3),
        "correct": ok,
        "batch": batch,
        "ms_per_batch": round(dt * 1e3, 2),
        "ms_per_batch_mean": round(sum(dts) / len(dts) * 1e3, 2),
    })

    # config 1: single-gate latency (batch 1, wall)
    c1a = ctx.encrypt(sk, np.array([1]), rng)
    c1b = ctx.encrypt(sk, np.array([1]), rng)
    out1 = ctx.eval_bin_gate(key, Gate.AND, c1a, c1b)
    jax.block_until_ready(out1)
    t0 = time.perf_counter()
    n1 = 3
    for _ in range(n1):
        out1 = ctx.eval_bin_gate(key, Gate.AND, c1a, c1b)
        jax.block_until_ready(out1)
    lat_ms = (time.perf_counter() - t0) / n1 * 1e3
    ok1 = int(np.asarray(ctx.decrypt(sk, out1, p=4))[0]) == 1
    results.append(emit({
        "metric": f"tfhe_{param_set.lower()}_single_and_latency",
        "value": round(lat_ms, 3), "unit": "ms",
        "vs_baseline": round(10.0 / lat_ms, 3), "correct": ok1}))

    return _HEADLINE


def bench_ckks(results: list):
    """Config 3: fused CKKS mult+relin+rescale at N=2^14, 8 limbs
    (ckks.mul_rescale: one EVAL-domain basis change for relin+rescale,
    Montgomery-prepared switching key)."""
    print("# bench_ckks: setup", file=sys.stderr)
    import jax.numpy as jnp
    from fhe_tpu.pke import ckks, rlwe
    from fhe_tpu.lattice import rns

    small = os.environ.get("FHE_BENCH_SMALL") == "1"
    N = 1 << (10 if small else 14)
    ctx = ckks.CkksContext.create(N=N, num_levels=7, scale_bits=26, dnum=3)
    rng = np.random.default_rng(1)
    t0 = time.monotonic()
    sk, pk = ctx.keygen(rng)
    print(f"# bench_ckks: keygen {time.monotonic()-t0:.0f}s",
          file=sys.stderr)
    t0 = time.monotonic()
    evk = rlwe.prepare_evk(ctx.params, ctx.relin_key_gen(sk, rng))
    print(f"# bench_ckks: evk {time.monotonic()-t0:.0f}s", file=sys.stderr)
    z = rng.normal(size=N // 2) * 0.5
    t0 = time.monotonic()
    ct = ctx.encrypt(pk, z, rng)
    mods = tuple(ctx.params.moduli)

    # correctness rides along
    got = ctx.decrypt(sk, ctx.mul_rescale(ct, ct, evk)).real
    ok = bool(np.abs(got - z * z).max() < 1e-2)
    print(f"# bench_ckks: encrypt+check {time.monotonic()-t0:.0f}s,"
          f" timing", file=sys.stderr)

    def step(c):
        x = ckks.Ciphertext(rns.RnsPoly(c, mods, rns.EVAL),
                            rns.RnsPoly(c, mods, rns.EVAL), ctx.scale)
        out = ctx.mul_rescale(x, x, evk)
        # restore the dropped limbs so the chain's shapes close (timing only)
        return jnp.concatenate([out.c0.data, out.c0.data[..., -ctx.cd:, :]],
                               axis=-2)

    dt = timed_diff(step, ct.c0.data)
    ms = None if dt is None else dt * 1e3
    results.append(emit({
        "metric": f"ckks_mult_relin_rescale_fused_n{N}_l{len(mods)}",
        "value": None if ms is None else round(ms, 4), "unit": "ms",
        "vs_baseline": None if ms is None else round(1.803 / ms, 2),
        "correct": ok,
        "note": "below measurement noise floor" if ms is None else None}))

    B = 32
    cB = jnp.broadcast_to(ct.c0.data, (B,) + ct.c0.data.shape)
    dt = timed_diff(step, cB, k=3, iters=3)
    msb = None if dt is None else dt * 1e3 / B
    results.append(emit({
        "metric": f"ckks_mult_relin_rescale_fused_n{N}_batch{B}_per_ct",
        "value": None if msb is None else round(msb, 4), "unit": "ms",
        "vs_baseline": None if msb is None else round(1.803 / msb, 2)}))


def bench_bfv(results: list):
    """Config 4: BFV mult+relin at N=2^15 (the dot-product hot op).
    Reference CPU: BFVrns_MultRelin 3.021 ms (BENCHMARKS.md:110)."""
    print("# bench_bfv: setup", file=sys.stderr)
    from fhe_tpu.pke import bfv

    small = os.environ.get("FHE_BENCH_SMALL") == "1"
    N = 1 << (10 if small else 15)
    ctx = bfv.BfvContext.create(N=N, num_limbs=3, plain_mod=65537, dnum=3)
    rng = np.random.default_rng(2)
    sk, pk = ctx.keygen(rng)
    evk = ctx.relin_key_gen(sk, rng)
    m1 = rng.integers(0, 100, size=N)
    c1 = ctx.encrypt(pk, m1, rng)
    got = ctx.decrypt(sk, ctx.mul(c1, c1, evk))
    ok = bool(np.array_equal(got, (m1 * m1) % 65537))
    dt = timed_diff(lambda c: ctx.mul(c, c, evk), c1, k=3, iters=3)
    ms = None if dt is None else dt * 1e3
    results.append(emit({
        "metric": f"bfv_mult_relin_n{N}",
        "value": None if ms is None else round(ms, 3), "unit": "ms",
        "vs_baseline": None if ms is None else round(3.021 / ms, 2),
        "correct": ok}))


def bench_threshold(results: list):
    """Config 5: 3-of-5-style threshold CKKS decrypt (lead + 4 mains +
    fusion, one compiled pipeline).  Reference CPU: ~50 ms combine
    (README.md:143)."""
    print("# bench_threshold: setup", file=sys.stderr)
    import jax.numpy as jnp
    from fhe_tpu.pke import ckks, multiparty
    from fhe_tpu.lattice import rns

    small = os.environ.get("FHE_BENCH_SMALL") == "1"
    N = 1 << (10 if small else 12)
    # scale 2^29: the MP_SD = 2^20 flooding noise must sit well below the
    # scale for the decrypted message to survive (sigma_slot =
    # MP_SD*sqrt(n_parties*N)/scale ~= 0.27 here; at scale 2^26 the
    # flooding swamps unit-amplitude slots entirely)
    ctx = ckks.CkksContext.create(N=N, num_levels=3, scale_bits=29, dnum=2)
    rng = np.random.default_rng(3)
    sks, pk = multiparty.multiparty_keygen(ctx.params, 5, rng)
    z = rng.normal(size=N // 2)
    ct = ctx.encrypt(pk, z, rng)
    mods = tuple(ct.c0.moduli)
    s_stack = jnp.stack([sk.eval_poly(mods).data for sk in sks])
    pfn = multiparty._pipeline_fn(mods, N, 1, 5, multiparty.MP_SD)
    key0 = jax.random.key(7)

    got = multiparty.threshold_decrypt_pipeline(
        ctx.params, sks, ct.c0, ct.c1, np.random.default_rng(5))
    big = rns.to_bigint(got)
    Q = 1
    for q in ct.moduli:
        Q *= q
    val = ckks.decode(ckks._center(big, Q), N, ct.scale)
    sigma_slot = multiparty.MP_SD * float(np.sqrt(5 * N)) / ct.scale
    ok = bool(np.abs(val.real - z).max() < 5 * sigma_slot)

    def step(c1_data):
        ph = pfn(s_stack, ct.c0.data, c1_data, key0)
        return rns.to_eval(rns.RnsPoly(ph, mods, rns.COEFF)).data

    dt = timed_diff(step, ct.c1.data, k=4, iters=4)
    ms = None if dt is None else dt * 1e3
    results.append(emit({
        "metric": f"threshold_ckks_5party_n{N}",
        "value": None if ms is None else round(ms, 3), "unit": "ms",
        "vs_baseline": None if ms is None else round(50.0 / ms, 2),
        "correct": ok}))


def main():
    _default_backend()
    # Self-deadline: emit the headline and exit cleanly well before any
    # external timeout can produce an artifact without it (r04 lesson:
    # the driver's run died rc=124 mid-matrix and the headline never
    # printed).
    signal.alarm(int(max(60.0, budget_left())))
    try:
        bench_tfhe(_RESULTS)
    except Exception as e:  # noqa: BLE001
        print(f"# tfhe bench failed: {e!r}", file=sys.stderr)
    for name, fn in (("ckks", bench_ckks), ("bfv", bench_bfv),
                     ("threshold", bench_threshold)):
        if os.environ.get("FHE_BENCH_HEADLINE_ONLY") == "1":
            break
        if budget_left() < 120:
            print(f"# budget exhausted, skipping {name}", file=sys.stderr)
            continue
        try:
            fn(_RESULTS)
        except Exception as e:  # noqa: BLE001
            print(f"# {name} bench failed: {e!r}", file=sys.stderr)
    signal.alarm(0)
    print(json.dumps(_finalize_headline()), flush=True)


if __name__ == "__main__":
    main()
