"""Per-stage DEVICE timing of CKKS mult+relin+rescale at N=2^14 on the TPU.

Each stage is timed by k-vs-1 differencing inside one jitted scan (the
axon runtime has a ~1.3 ms per-scan-iteration floor that plain timing
cannot separate from sub-ms stages)."""
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
L, M = len(q_mods), len(ext_mods)
dnum = p.num_part_q
print(f"L={L} |P|={len(p_mods)} M={M} dnum={dnum} npp={p.num_per_part} "
      f"cd={ctx.cd} impl={rns._rns_impl(rns.make_rns_plan(N, q_mods))}",
      flush=True)

rng = np.random.default_rng(1)
mk = lambda mods: jnp.asarray(
    np.stack([rng.integers(0, q, size=N, dtype=np.int64) for q in mods]
             ).astype(np.uint32))
cQ = mk(q_mods)
ups = jnp.asarray(np.stack([np.asarray(mk(ext_mods)) for _ in range(dnum)]))
evb = jnp.asarray(np.stack([np.asarray(mk(ext_mods)) for _ in range(dnum)]))
eva = jnp.asarray(np.stack([np.asarray(mk(ext_mods)) for _ in range(dnum)]))

planQ = rns.make_rns_plan(N, q_mods)
planE = rns.make_rns_plan(N, ext_mods)


def timed(name, body, init):
    def run(kk):
        def one(c, _):
            for _i in range(kk):
                c = body(c)
            return c, None
        f = jax.jit(lambda c: lax.scan(one, c, None, length=R)[0])
        out = f(init)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(init)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / R
    t1 = run(1)
    tk = run(K)
    dt = (tk - t1) / (K - 1) * 1e3
    print(f"{name:40s} {dt:8.3f} ms", flush=True)


from fhe_tpu.math.modmath import mont_mul, add_mod

timed("ntt_inverse [8,N]", lambda c: rns.ntt_inverse(planQ, c), cQ)
timed("ntt_forward [8,N]", lambda c: rns.ntt_forward(planQ, c), cQ)
timed("ntt_forward [33,N]",
      lambda u: rns.ntt_forward(planE, u.reshape(dnum, M, N)
                                ).reshape(dnum, M, N), ups)

q = planE.q_arr[:, None]
qi = planE.qinv_neg[:, None]
r2 = planE.r2[:, None]


def inner(u):
    bm = mont_mul(evb, r2[None], q[None], qi[None])
    am = mont_mul(eva, r2[None], q[None], qi[None])
    t0 = mont_mul(u, bm, q[None], qi[None])
    t1 = mont_mul(u, am, q[None], qi[None])
    d0, d1 = t0[0], t1[0]
    for d in range(1, dnum):
        d0 = add_mod(d0, t0[d], q)
        d1 = add_mod(d1, t1[d], q)
    return jnp.broadcast_to(jnp.stack([d0, d1])[None], (dnum, 2, M, N)
                            )[:, 0, :, :]


def inner_pre(u):
    t0 = mont_mul(u, evb, q[None], qi[None])
    t1 = mont_mul(u, eva, q[None], qi[None])
    d0, d1 = t0[0], t1[0]
    for d in range(1, dnum):
        d0 = add_mod(d0, t0[d], q)
        d1 = add_mod(d1, t1[d], q)
    return jnp.broadcast_to(jnp.stack([d0, d1])[None], (dnum, 2, M, N)
                            )[:, 0, :, :]


timed("inner products (r2 conv, as now)", inner, ups)
timed("inner products (premont keys)", inner_pre, ups)


def tensor(c):
    a = rns.RnsPoly(c, q_mods, rns.EVAL)
    d0 = rns.mul(a, a)
    d1 = rns.add(rns.mul(a, a), rns.mul(a, a))
    d2 = rns.mul(a, a)
    return rns.add(rns.add(d0, d1), d2).data


timed("tensor product (4 rns.mul)", tensor, cQ)


def moddown_now(c2):
    both = rns.RnsPoly(c2.reshape(dnum, M, N)[:2], ext_mods, rns.EVAL)
    down = rns.to_eval(rns.approx_mod_down(
        rns.to_coeff(both), q_mods, p_mods, None))
    pad = jnp.zeros((dnum, M, N), jnp.uint32)
    return pad.at[:2, :L].set(down.data)


timed("moddown both comps (coeff rt, now)", moddown_now, ups)


def rescale_now(c):
    a = rns.RnsPoly(c, q_mods, rns.EVAL)
    c0 = rns.to_coeff(a)
    c0 = rns.drop_last_element_and_scale(c0)
    out = rns.to_eval(c0)
    return jnp.concatenate([out.data, out.data[-1:]], axis=0)


timed("rescale one comp (as now)", rescale_now, cQ)

evk = rlwe.EvalKey(b=evb, a=eva, moduli_qp=ext_mods,
                   num_per_part=p.num_per_part)


def ks_only(c):
    d0, d1 = rlwe.key_switch_fused(p, evk, rns.RnsPoly(c, q_mods, rns.EVAL))
    return add_mod(d0.data, d1.data, planQ.q_arr[:, None])


timed("key_switch_fused (whole, now)", ks_only, cQ)


def whole(c):
    ct = ckks.Ciphertext(rns.RnsPoly(c, q_mods, rns.EVAL),
                         rns.RnsPoly(c, q_mods, rns.EVAL), ctx.scale)
    out = ctx.rescale(ctx.mul(ct, ct, evk))
    return jnp.concatenate([out.c0.data, out.c0.data[-1:]], axis=0)


timed("WHOLE mult+relin+rescale", whole, cQ)
