"""Headline benchmark: batched STD128 TFHE gate bootstraps/sec on TPU.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference CPU build evaluates one bootstrapped binary gate in
~10 ms single-thread (/root/reference/README.md:139) => 100 gates/s.

Run with the ambient environment (axon TPU); falls back to whatever backend
JAX provides. Batch size is chosen per backend: the TPU throughput path
batches thousands of gates (SURVEY SS2.7 P2 north star), the CPU smoke run
uses a small batch.
"""

import json
import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fhe_tpu.tfhe import BinFheContext, Gate, lwe, boot  # noqa: E402

BASELINE_GATES_PER_SEC = 100.0  # reference: ~10 ms/gate, EPYC 7763 1T


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


def main():
    on_tpu = _default_backend() == "tpu"
    param_set = os.environ.get("FHE_BENCH_PARAMS", "STD128")
    batch = int(os.environ.get("FHE_BENCH_BATCH", "2048" if on_tpu else "8"))
    iters = int(os.environ.get("FHE_BENCH_ITERS", "3" if on_tpu else "1"))

    ctx = BinFheContext.generate(param_set)
    rng = np.random.default_rng(2026)
    sk = ctx.key_gen(rng)
    key = ctx.bt_key_gen(sk, rng)

    m1 = rng.integers(0, 2, size=batch)
    m2 = rng.integers(0, 2, size=batch)
    ct1 = ctx.encrypt(sk, m1, rng)
    ct2 = ctx.encrypt(sk, m2, rng)

    # warmup (compile)
    out = ctx.eval_bin_gate(key, Gate.AND, ct1, ct2)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = ctx.eval_bin_gate(key, Gate.AND, ct1, ct2)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    # correctness check rides along
    got = np.asarray(ctx.decrypt(sk, out, p=4))
    ok = bool(np.array_equal(got, m1 & m2))

    gates_per_sec = batch / dt
    print(json.dumps({
        "metric": f"tfhe_{param_set.lower()}_and_bootstraps_per_sec"
                  f"_b{batch}_{jax.default_backend()}",
        "value": round(gates_per_sec, 2),
        "unit": "gates/s",
        "vs_baseline": round(gates_per_sec / BASELINE_GATES_PER_SEC, 3),
        "correct": ok,
        "batch": batch,
        "ms_per_batch": round(dt * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
