import os
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
import jax; jax.config.update('jax_platforms', 'cpu')
import numpy as np, time
from fhe_tpu.pke import ckks, bootstrap
from fhe_tpu.lattice import rns
N, H = 128, 16
ctx = ckks.CkksContext.create(N=N, num_levels=13, scale_bits=52, dnum=2, composite_degree=2)
rng = np.random.default_rng(42)
sk, pk = ctx.keygen(rng, h=H)
pre = bootstrap.setup(ctx, h=H)
keys = bootstrap.keygen(ctx, sk, pre, rng)
z = rng.uniform(-0.4, 0.4, size=N//2)
ct = ctx.encrypt(pk, z, rng)
drop = len(ct.moduli) - ctx.cd
ct1 = ckks.Ciphertext(rns.level_reduce(ct.c0, drop), rns.level_reduce(ct.c1, drop), ct.scale)
t0 = time.time()
out = bootstrap.eval_bootstrap(ctx, ct1, pre, keys)
jax.block_until_ready(out.c0.data)
print("unjitted: %.1fs" % (time.time()-t0), flush=True)
got = ctx.decrypt(sk, out).real
print("unjitted err:", float(np.abs(got - z).max()), "levels:", len(out.moduli), flush=True)
f = jax.jit(lambda c, k: bootstrap.eval_bootstrap(ctx, c, pre, k))
t0 = time.time()
out2 = f(ct1, keys); jax.block_until_ready(out2.c0.data)
print("jit compile+run: %.1fs" % (time.time()-t0), flush=True)
got2 = ctx.decrypt(sk, out2).real
print("jitted err:", float(np.abs(got2 - z).max()), flush=True)
print("bit-identical:", bool(jax.numpy.array_equal(out.c0.data, out2.c0.data)), flush=True)
t0 = time.time()
out3 = f(ct1, keys); jax.block_until_ready(out3.c0.data)
print("jitted run: %.2fs" % (time.time()-t0), flush=True)
