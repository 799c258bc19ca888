"""Device time of the NEW fused CKKS mult+relin+rescale at N=2^14 (TPU),
single and batch-32, prepared vs plain keys."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from fhe_tpu.pke import ckks, rlwe
from fhe_tpu.lattice import rns

N = 1 << 14
R = 8
K = 5
ctx = ckks.CkksContext.create(N=N, num_levels=7, scale_bits=26, dnum=3)
p = ctx.params
q_mods = tuple(p.moduli)
p_mods = tuple(p.special_mods)
ext_mods = q_mods + p_mods
dnum = p.num_part_q
M = len(ext_mods)
L = len(q_mods)

rng = np.random.default_rng(1)
mk = lambda mods, lead=(): jnp.asarray(
    rng.integers(0, np.array(mods)[:, None],
                 size=lead + (len(mods), N)).astype(np.uint32))
cQ = mk(q_mods)
evk = rlwe.EvalKey(
    b=jnp.asarray(np.stack([np.asarray(mk(ext_mods)) for _ in range(dnum)])),
    a=jnp.asarray(np.stack([np.asarray(mk(ext_mods)) for _ in range(dnum)])),
    moduli_qp=ext_mods, num_per_part=p.num_per_part)
pevk = rlwe.prepare_evk(p, evk)


def timed(name, body, init, r=R, k=K):
    def run(kk):
        def one(c, _):
            for _i in range(kk):
                c = body(c)
            return c, None
        f = jax.jit(lambda c: lax.scan(one, c, None, length=r)[0])
        out = f(init)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(init)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / r)
        return best
    t1 = run(1)
    tk = run(k)
    dt = (tk - t1) / (k - 1) * 1e3
    print(f"{name:44s} {dt:8.3f} ms", flush=True)
    return dt


def whole_old(c):
    ct = ckks.Ciphertext(rns.RnsPoly(c, q_mods, rns.EVAL),
                         rns.RnsPoly(c, q_mods, rns.EVAL), ctx.scale)
    out = ctx.rescale(ctx.mul(ct, ct, evk))
    return jnp.concatenate([out.c0.data, out.c0.data[-1:]], axis=0)


def mk_fused(key):
    def f(c):
        ct = ckks.Ciphertext(rns.RnsPoly(c, q_mods, rns.EVAL),
                             rns.RnsPoly(c, q_mods, rns.EVAL), ctx.scale)
        out = ctx.mul_rescale(ct, ct, key)
        return jnp.concatenate([out.c0.data, out.c0.data[-1:]], axis=0)
    return f


timed("OLD mult+relin+rescale (unfused)", whole_old, cQ)
timed("FUSED mul_rescale (plain evk)", mk_fused(evk), cQ)
timed("FUSED mul_rescale (prepared evk)", mk_fused(pevk), cQ)

B = 32
cB = mk(q_mods, (B,))
dt = timed("FUSED batch-32 (prepared evk)", mk_fused(pevk), cB, r=4, k=4)
print(f"per-ct at batch {B}: {dt / B:.4f} ms", flush=True)
