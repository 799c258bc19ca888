"""Multi-device scaling measurements on the virtual CPU mesh.

Produces the scaling table for BENCHMARKS.md: batch-DP gate throughput
at 1/2/4/8 devices, the digit-sharded HYBRID key switch vs the
replicated path, and the coefficient-sharded four-step NTT vs the
single-device four-step at N=2^16/2^17.

CAVEAT (printed with every row): virtual devices share this host's CPU
cores, so wall-clock "speedup" cannot exceed the physical core count —
on a 1-core host all compute serializes and the interesting number is
the COMMUNICATION OVERHEAD: T(n) / (n * T(1)) for weak scaling (batch
per device fixed).  overhead ~1.0 means the sharded program adds no
work beyond the n sequential shards: on real chips the same program's
compute runs concurrently, so chip-scaling efficiency ~= 1/overhead.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python bench_scaling.py
"""

import json
import os
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from jax.sharding import NamedSharding, PartitionSpec as P


def emit(rec):
    print(json.dumps(rec), flush=True)


def timed(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out))
        best = min(best, time.perf_counter() - t0)
    return best


def mesh_of(n):
    return jax.make_mesh((n,), ("dev",), devices=jax.devices()[:n],
                         axis_types=(jax.sharding.AxisType.Auto,))


def bench_gate_dp():
    """Weak-scaling batch-DP TOY gates: batch = 8 * n_dev."""
    from fhe_tpu.tfhe import BinFheContext, Gate

    ctx = BinFheContext.generate("TOY")
    rng = np.random.default_rng(0)
    sk = ctx.key_gen(rng)
    key = ctx.bt_key_gen(sk, rng)
    t1 = None
    for n in (1, 2, 4, 8):
        B = 8 * n
        m1 = rng.integers(0, 2, size=B)
        m2 = rng.integers(0, 2, size=B)
        ct1 = ctx.encrypt(sk, m1, rng)
        ct2 = ctx.encrypt(sk, m2, rng)
        mesh = mesh_of(n)
        repl = NamedSharding(mesh, P())
        bsh = NamedSharding(mesh, P("dev"))
        keyn = jax.tree.map(lambda x: jax.device_put(x, repl), key)
        sh = lambda ct: jax.tree.map(lambda x: jax.device_put(x, bsh), ct)
        dt = timed(lambda a, b: ctx.eval_bin_gate(keyn, Gate.AND, a, b),
                   sh(ct1), sh(ct2))
        if n == 1:
            t1 = dt
        overhead = dt / (n * t1)
        emit({"metric": f"gate_dp_weak_scaling_{n}dev_b{B}",
              "wall_s": round(dt, 3),
              "comm_overhead_vs_serial": round(overhead, 3),
              "projected_chip_efficiency": round(1 / overhead, 3)})


def bench_keyswitch_sharded():
    """Digit-sharded HYBRID switch vs single-device (N=512, 8 digits)."""
    from fhe_tpu.lattice import rns
    from fhe_tpu.lattice.rns import RnsPoly, EVAL
    from fhe_tpu.parallel import collective
    from fhe_tpu.pke import params as pkeparams, rlwe

    rng = np.random.default_rng(7)
    N = 512
    p = pkeparams.make_ckks_params(N=N, num_levels=7, scale_bits=28, dnum=8)
    sk = rlwe.keygen(p, rng)
    s = sk.eval_poly(tuple(p.moduli))
    evk = rlwe.evk_gen(p, rns.mul(s, s), sk, rng)
    data = np.stack([rng.integers(0, q, size=N, dtype=np.int64)
                     for q in p.moduli]).astype(np.uint32)
    c = RnsPoly(jnp.asarray(data), tuple(p.moduli), EVAL)
    t_single = timed(lambda cc: rlwe.key_switch(p, evk, cc), c)
    for n in (2, 4, 8):
        mesh = mesh_of(n)
        t_sh = timed(lambda cc: collective.key_switch_sharded(
            p, evk, cc, mesh, "dev"), c)
        emit({"metric": f"keyswitch_digit_sharded_{n}dev",
              "wall_s": round(t_sh, 3), "single_dev_s": round(t_single, 3),
              "comm_overhead_vs_serial": round(t_sh / t_single, 3)})


def bench_ntt_sharded():
    """Coefficient-sharded four-step NTT vs single-device, N=2^16/2^17."""
    from fhe_tpu.math import primes, ntt as nttmod
    from fhe_tpu.parallel import ntt_sharded

    rng = np.random.default_rng(5)
    for logN in (16, 17):
        N = 1 << logN
        q = primes.generate_ntt_primes(30, 2 * N, 1)[0]
        x = jnp.asarray(rng.integers(0, q, size=N, dtype=np.int64)
                        .astype(np.uint32))
        plan = nttmod.make_plan(N, q)
        t_single = timed(lambda v: nttmod.ntt_forward(plan, v[None],
                                                      "fourstep")[0], x)
        mesh = mesh_of(8)
        fn, aux = ntt_sharded.forward_sharded(N, q, mesh, "dev")
        xs = ntt_sharded.shard_coef(x[None], mesh, "dev")
        t_sh = timed(lambda v: fn(v, *aux), xs)
        emit({"metric": f"ntt_coeff_sharded_8dev_n{N}",
              "wall_s": round(t_sh, 3), "single_dev_s": round(t_single, 3),
              "comm_overhead_vs_serial": round(t_sh / t_single, 3)})


if __name__ == "__main__":
    print("# virtual-device mesh on a shared-core host: see module "
          "docstring for how to read comm_overhead", flush=True)
    bench_gate_dp()
    bench_keyswitch_sharded()
    bench_ntt_sharded()
