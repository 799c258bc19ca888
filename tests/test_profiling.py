"""Profiling utility tests (reference utils/debug.h TIC/TOC/PROFILELOG)."""

import time

import jax.numpy as jnp

from fhe_tpu.utils import profiling


def test_tic_toc_blocks_on_device():
    t0 = profiling.tic()
    x = jnp.arange(1024) * 2
    dt = profiling.toc(t0, x)
    assert dt >= 0


def test_stage_registry_and_report():
    profiling.reset()
    with profiling.stage("unit_stage"):
        time.sleep(0.01)
    with profiling.stage("unit_stage"):
        time.sleep(0.01)
    rep = profiling.report()
    assert rep["unit_stage"]["calls"] == 2
    assert rep["unit_stage"]["mean_ms"] >= 10.0
    profiling.reset()
    assert profiling.report() == {}


def test_profiled_decorator_and_enable_switch():
    profiling.reset()

    @profiling.profiled(name="decorated")
    def f(x):
        return jnp.sum(x)

    f(jnp.ones(16))
    assert profiling.report()["decorated"]["calls"] == 1
    profiling.enable(False)
    f(jnp.ones(16))
    assert profiling.report()["decorated"]["calls"] == 1   # unchanged
    profiling.enable(True)
    profiling.reset()
