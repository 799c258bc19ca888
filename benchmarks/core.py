"""Benchmark harness core: timing, artifact output, shared caches.

The TPU-native analogue of the reference's google-benchmark runner
(/root/reference/benchmark/src/*.cpp, BENCHMARK()/BENCHMARK_CAPTURE()
macros): each suite module registers named cases; the runner times them
on the ambient device and writes one JSON line per case to a committed
artifact (benchmarks/results/*.jsonl) plus a markdown table.

Two timing modes, both reported in microseconds like the reference's
`Unit(benchmark::kMicrosecond)`:

- `timed`: min-of-iters wall time of a blocking device call.  Valid for
  ms-scale ops where the tunneled runtime's ~1.3 ms dispatch floor is
  noise.
- `timed_diff`: pure device time by dependent-chain differencing (time a
  jitted scan applying the op k times per iteration vs once, report
  (t_k - t_1)/(k-1)).  Required for sub-ms ops: the reference baselines
  are pure-compute CPU times, so this is the apples-to-apples number.
"""

from __future__ import annotations

import json
import os
import sys
import time
from dataclasses import dataclass, field

import numpy as np
import jax

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

CACHE_DIR = os.path.join(_REPO, ".bench_cache")
os.makedirs(CACHE_DIR, exist_ok=True)
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(CACHE_DIR, "xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception as e:  # noqa: BLE001
    print(f"# compilation cache unavailable: {e!r}", file=sys.stderr)


def ensure_backend() -> str:
    """Degrade to CPU when the TPU plugin registers but its tunnel is
    down (axon raises UNAVAILABLE at init instead of falling through)."""
    try:
        return jax.default_backend()
    except RuntimeError as e:
        print(f"# tpu backend unavailable ({e}); falling back to cpu",
              file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
        return jax.default_backend()


def timed(fn, iters: int = 5, warmup: int = 1) -> float:
    """Min-of-iters wall seconds of `fn()` (blocks on the result)."""
    for _ in range(warmup):
        jax.block_until_ready(jax.tree.leaves(fn()))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.tree.leaves(fn()))
        best = min(best, time.perf_counter() - t0)
    return best


def timed_diff(step, init, k: int = 4, iters: int = 4) -> float | None:
    """Pure device seconds of one `step` application (see module doc).
    Returns None when the difference is below timer noise."""
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
    return None if dt < 2e-6 else dt


@dataclass
class Suite:
    """A named collection of benchmark records (one google-benchmark
    translation unit's worth)."""
    name: str
    records: list = field(default_factory=list)
    budget_s: float = float(os.environ.get("FHE_BENCH_SUITE_BUDGET", "900"))
    _t0: float = field(default_factory=time.monotonic)

    def over_budget(self) -> bool:
        return time.monotonic() - self._t0 > self.budget_s

    def add(self, case: str, seconds: float | None, *, unit: str = "us",
            ref_us: float | None = None, scale: float = 1.0, **extra):
        """scale: divide the measured time by this (e.g. the batch size,
        to report per-item time of a batched case)."""
        us = None if seconds is None else seconds * 1e6 / scale
        rec = {"suite": self.name, "case": case,
               "value": None if us is None else round(us, 3), "unit": unit,
               "backend": jax.default_backend()}
        if ref_us is not None and us:
            rec["ref_cpu_us"] = ref_us
            rec["vs_ref"] = round(ref_us / us, 2)
        rec.update(extra)
        self.records.append(rec)
        print(json.dumps(rec), flush=True)

    def wall(self, case: str, fn, iters: int = 5, **kw):
        try:
            self.add(case, timed(fn, iters=iters), **kw)
        except Exception as e:  # noqa: BLE001 - one case must not sink the suite
            print(f"# {self.name}/{case} failed: {e!r}", file=sys.stderr)
            self.records.append({"suite": self.name, "case": case,
                                 "error": repr(e)})

    def device(self, case: str, step, init, k: int = 4, iters: int = 4,
               **kw):
        try:
            self.add(case, timed_diff(step, init, k=k, iters=iters), **kw)
        except Exception as e:  # noqa: BLE001
            print(f"# {self.name}/{case} failed: {e!r}", file=sys.stderr)
            self.records.append({"suite": self.name, "case": case,
                                 "error": repr(e)})


def write_results(suites: list, path: str):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        meta = {"backend": jax.default_backend(),
                "device": str(jax.devices()[0]),
                "jax": jax.__version__}
        f.write(json.dumps({"meta": meta}) + "\n")
        for s in suites:
            for r in s.records:
                f.write(json.dumps(r) + "\n")
    print(f"# wrote {path}", file=sys.stderr)


def rng(seed: int = 12345) -> np.random.Generator:
    return np.random.default_rng(seed)
