import time, numpy as np, jax, jax.numpy as jnp
from jax import lax
from fhe_tpu.pke import ckks, rlwe
from fhe_tpu.lattice import rns

N = 1 << 14
ctx = ckks.CkksContext.create(N=N, num_levels=7, scale_bits=26, dnum=3)
p = ctx.params
rng = np.random.default_rng(1)
sk, pk = ctx.keygen(rng)
evk = ctx.relin_key_gen(sk, rng)
z = rng.normal(size=N // 2) * 0.5
ct = ctx.encrypt(pk, z, rng)
mods = tuple(p.moduli)
R = 8

def timed_diff(step, init, k=5):
    def run(kk):
        def body(c, _):
            for _i in range(kk):
                c = step(c)
            return c, None
        f = jax.jit(lambda c: lax.scan(body, c, None, length=R)[0])
        out = f(init); jax.block_until_ready(jax.tree.leaves(out))
        t0 = time.perf_counter()
        out = f(init); jax.block_until_ready(jax.tree.leaves(out))
        return (time.perf_counter() - t0) / R
    t1 = run(1); tk = run(k)
    return (tk - t1) / (k - 1) * 1e3

def whole(c):
    out = ctx.rescale(ctx.mul(c, c, evk))
    p0 = jnp.concatenate([out.c0.data, out.c0.data[-1:]], axis=0)
    p1 = jnp.concatenate([out.c1.data, out.c1.data[-1:]], axis=0)
    return ckks.Ciphertext(rns.RnsPoly(p0, mods, rns.EVAL), rns.RnsPoly(p1, mods, rns.EVAL), ct.scale)

print(f"mult+relin+rescale (fused ks): {timed_diff(whole, ct):.3f} ms", flush=True)
