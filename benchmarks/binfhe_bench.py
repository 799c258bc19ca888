"""binfhe (FHEW/TFHE) benchmarks.

Mirrors /root/reference/benchmark/src/binfhe-ginx.cpp,
binfhe-ap.cpp, binfhe-lmkcdey.cpp, binfhe-paramsets.cpp:
FHEW_{BTKEYGEN, ENCRYPT, NOT, KEYSWITCH, BINGATE(AND/OR)} per paramset,
plus multi-input AND3/AND4 and the batched-throughput variants that are
the TPU's reason to exist (the reference's per-gate numbers are
sequential; ours amortize one megakernel launch over the batch).

Reference M1 Max CPU anchors (BASELINE.md): BTKeyGen STD128 2.18 s,
BINGATE AND STD128 50,540 us/gate, KEYSWITCH STD128 911 us.
"""

from __future__ import annotations

import os
import time

import numpy as np
import jax

from .core import Suite, rng as mkrng

GATE_SETS = ("MEDIUM", "STD128", "STD128_LMKCDEY")
BATCH = int(os.environ.get("FHE_BENCH_GATE_BATCH", "512"))


def _one_set(s: Suite, param_set: str, batch: int):
    from fhe_tpu.tfhe import BinFheContext, Gate, lwe

    ctx = BinFheContext.generate(param_set)
    r = mkrng(7)
    sk = ctx.key_gen(r)

    t0 = time.perf_counter()
    key = ctx.bt_key_gen(sk, r)
    jax.block_until_ready(jax.tree.leaves(key))
    ref = {"MEDIUM": 4.83e6, "STD128": 2.18e6}.get(param_set)
    s.add(f"FHEW_BTKEYGEN/{param_set}", time.perf_counter() - t0,
          ref_us=ref, note="wall, includes device transfer")

    s.wall(f"FHEW_ENCRYPT/{param_set}",
           lambda: ctx.encrypt(sk, np.array([1]), r), iters=3)

    m = r.integers(0, 2, size=batch)
    ct1 = ctx.encrypt(sk, m, r)
    ct2 = ctx.encrypt(sk, 1 - m, r)

    s.device(f"FHEW_NOT/{param_set}", ctx.eval_not, ct1, k=5, iters=4)

    # KEYSWITCH: dim-N -> dim-n at qKS on the one-hot MXU path (the
    # output is zero-padded back to dim N so the timing chain closes;
    # the pad is free next to the switch itself)
    ks_in = lwe.LweCiphertext(
        a=jax.numpy.zeros((batch, ctx.params.N), dtype=jax.numpy.uint32),
        b=jax.numpy.zeros((batch,), dtype=jax.numpy.uint32),
        modulus=ctx.params.q_ks, pt_mod=4)

    def ks_step(c):
        o = lwe.key_switch(ctx.params, key.ksk, c)
        return lwe.LweCiphertext(
            a=jax.numpy.pad(o.a, ((0, 0),
                                  (0, ctx.params.N - ctx.params.n))),
            b=o.b, modulus=c.modulus, pt_mod=c.pt_mod)

    s.device(f"FHEW_KEYSWITCH/{param_set}_b{batch}", ks_step, ks_in,
             k=3, iters=3,
             ref_us=911.0 * batch if param_set == "STD128" else None,
             note=f"per batch of {batch}")

    # BINGATE throughput: one batched megakernel launch
    out = ctx.eval_bin_gate(key, Gate.AND, ct1, ct2)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    iters = 2
    for _ in range(iters):
        out = ctx.eval_bin_gate(key, Gate.AND, ct1, ct2)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    got = np.asarray(ctx.decrypt(sk, out, p=4))
    ok = bool(np.array_equal(got, m & (1 - m)))
    ref_gate = {"STD128": 50540.0, "MEDIUM": 42387.0}.get(param_set)
    s.add(f"FHEW_BINGATE_AND/{param_set}_b{batch}", dt / batch,
          ref_us=ref_gate, correct=ok, gates_per_sec=round(batch / dt, 1),
          note="per gate, batched")


def _multi_input(s: Suite):
    from fhe_tpu.tfhe import BinFheContext, Gate

    for ps, gate, nin in (("STD128_3", Gate.AND3, 3),
                          ("STD128_4", Gate.AND4, 4)):
        if s.over_budget():
            return
        try:
            ctx = BinFheContext.generate(ps)
            r = mkrng(9)
            sk = ctx.key_gen(r)
            key = ctx.bt_key_gen(sk, r)
            batch = 64
            p = 6 if nin == 3 else 8
            ms = [np.ones(batch, dtype=np.int64) for _ in range(nin)]
            cts = [ctx.encrypt(sk, mm, r, p=p) for mm in ms]
            out = ctx.eval_bin_gate_multi(key, gate, cts)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = ctx.eval_bin_gate_multi(key, gate, cts)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            ok = bool(np.all(np.asarray(ctx.decrypt(sk, out, p=p)) == 1))
            s.add(f"FHEW_BINGATE_{gate.name}/{ps}_b{batch}", dt / batch,
                  correct=ok, note="per gate, batched")
        except Exception as e:  # noqa: BLE001
            print(f"# multi-input {ps} skipped: {e!r}")


def run() -> Suite:
    s = Suite("binfhe")
    batch = BATCH
    for ps in GATE_SETS:
        if s.over_budget():
            s.add(f"skipped_{ps}", None, note="suite budget")
            continue
        try:
            _one_set(s, ps, batch)
        except Exception as e:  # noqa: BLE001
            print(f"# binfhe/{ps} failed: {e!r}")
    _multi_input(s)
    return s
