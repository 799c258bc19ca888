"""Tracing / profiling utilities.

Reference semantics: /root/reference/src/core/include/utils/debug.h --
TIC/TOC wall-clock macros (:123-148), PROFILELOG stream logging, and the
per-stage bootstrap timing prints (ckksrns-fhe.cpp:683-684); plus the
google-benchmark harness (benchmark/src/*) for kernel-level numbers.

TPU equivalents:
* tic()/toc() -- wall-clock pairs that BLOCK on device work
  (jax.block_until_ready), so a toc() after a jitted call measures real
  execution, not async dispatch.
* stage() context manager / @profiled decorator -- the PROFILELOG
  analogue; records into a process-wide registry that report() dumps
  (the reference's committed BENCHMARKS*.txt role).
* trace() -- wraps jax.profiler.trace for XLA/TPU timeline capture
  (the deep-dive path; inspect with TensorBoard or xprof).
"""

from __future__ import annotations

import contextlib
import functools
import time
from collections import defaultdict

import jax

_REGISTRY: dict[str, list[float]] = defaultdict(list)
_ENABLED = True


def enable(on: bool = True) -> None:
    """Master switch (the reference's NDEBUG/PROFILE compile flags,
    flipped at runtime)."""
    global _ENABLED
    _ENABLED = on


def tic() -> float:
    return time.perf_counter()


def toc(t0: float, *block_on) -> float:
    """Elapsed seconds since t0; blocks on any given jax values first
    (TOC with device-synchronous semantics)."""
    for v in block_on:
        jax.block_until_ready(v)
    return time.perf_counter() - t0


@contextlib.contextmanager
def stage(name: str, *, log: bool = False):
    """PROFILELOG analogue: time a named stage into the registry.

        with profiling.stage("CoeffsToSlots"):
            enc = bsgs_linear_transform(...)
    """
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if _ENABLED:
            dt = time.perf_counter() - t0
            _REGISTRY[name].append(dt)
            if log:
                print(f"[profile] {name}: {dt * 1e3:.3f} ms")


def profiled(fn=None, *, name: str | None = None):
    """Decorator form of stage(); blocks on the result so jitted callees
    are charged to the right stage."""
    if fn is None:
        return functools.partial(profiled, name=name)
    label = name or fn.__qualname__

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if not _ENABLED:
            return fn(*args, **kwargs)
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        try:
            jax.block_until_ready(out)
        except Exception:
            pass
        _REGISTRY[label].append(time.perf_counter() - t0)
        return out

    return wrapper


def report(reset: bool = False) -> dict[str, dict[str, float]]:
    """Summary stats per stage: {name: {calls, total_s, mean_ms, min_ms}}."""
    out = {}
    for name, ts in _REGISTRY.items():
        out[name] = {
            "calls": len(ts),
            "total_s": sum(ts),
            "mean_ms": 1e3 * sum(ts) / len(ts),
            "min_ms": 1e3 * min(ts),
        }
    if reset:
        _REGISTRY.clear()
    return out


def reset() -> None:
    _REGISTRY.clear()


@contextlib.contextmanager
def trace(logdir: str):
    """XLA timeline capture (jax.profiler) -- the deep-dive equivalent of
    the reference's google-benchmark + Instruments flow."""
    with jax.profiler.trace(logdir):
        yield
