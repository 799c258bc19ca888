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

def P(name, ms): print(f"{name:34s} {ms:8.3f} ms", flush=True)

P("tensor product (3 muls)", timed_diff(lambda d: rns.mul(rns.RnsPoly(d, mods, rns.EVAL), rns.RnsPoly(d, mods, rns.EVAL)).data, ct.c1.data))
P("rns fwd NTT [8,16k]", timed_diff(lambda d: rns.to_eval(rns.RnsPoly(d, mods, rns.COEFF)).data, ct.c1.data))
P("rns inv NTT [8,16k]", timed_diff(lambda d: rns.to_coeff(rns.RnsPoly(d, mods, rns.EVAL)).data, ct.c1.data))

def pre_step(d):
    ups = rlwe.key_switch_precompute(p, rns.RnsPoly(d, mods, rns.EVAL))
    return ups[0].data[:len(mods)]
P("precompute (iNTT+3xModUp+3xNTT)", timed_diff(pre_step, ct.c1.data))

ups0 = rlwe.key_switch_precompute(p, ct.c1)
def inner_step(d):
    ups = [rns.RnsPoly(u.data + (d[:1,:1] * 0).astype(jnp.uint32), u.moduli, u.fmt) for u in ups0]
    d0, d1 = rlwe.key_switch_inner(p, evk, ups)
    return d0.data[:len(mods)]
P("inner products", timed_diff(inner_step, ct.c1.data))

def down_step(d):
    ext = tuple(mods) + tuple(p.special_mods)
    pol = rns.RnsPoly(jnp.concatenate([d, d[:len(p.special_mods)]], axis=0), ext, rns.EVAL)
    return rlwe.key_switch_down_poly(p, pol).data
P("mod down (one component)", timed_diff(down_step, ct.c1.data))

def resc_step(d):
    out = rns.drop_last_element_and_scale(rns.RnsPoly(d, mods, rns.COEFF))
    return jnp.concatenate([out.data, out.data[-1:]], axis=0)
P("rescale", timed_diff(resc_step, ct.c1.data))
