"""Console entry points for the installed package."""

from __future__ import annotations

import runpy
import os


def bench_main():
    """`fhe-tpu-bench`: run the headline benchmark (repo-root bench.py when
    run from a checkout, else the packaged equivalent inline)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench = os.path.join(root, "bench.py")
    if os.path.exists(bench):
        runpy.run_path(bench, run_name="__main__")
        return
    # installed without the repo checkout: run the same measurement inline
    import json
    import time
    import numpy as np
    import jax
    from fhe_tpu.tfhe import BinFheContext, Gate

    param_set = os.environ.get("FHE_BENCH_PARAMS", "STD128")
    on_tpu = jax.default_backend() == "tpu"
    batch = int(os.environ.get("FHE_BENCH_BATCH", "2048" if on_tpu else "8"))
    ctx = BinFheContext.generate(param_set)
    rng = np.random.default_rng(2026)
    sk = ctx.key_gen(rng)
    key = ctx.bt_key_gen(sk, rng)
    m1 = rng.integers(0, 2, size=batch)
    m2 = rng.integers(0, 2, size=batch)
    ct1, ct2 = ctx.encrypt(sk, m1, rng), ctx.encrypt(sk, m2, rng)
    out = ctx.eval_bin_gate(key, Gate.AND, ct1, ct2)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = ctx.eval_bin_gate(key, Gate.AND, ct1, ct2)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(json.dumps({"metric": f"tfhe_{param_set.lower()}_and_gates_per_sec",
                      "value": round(batch / dt, 2), "unit": "gates/s",
                      "vs_baseline": round(batch / dt / 100.0, 3)}))
