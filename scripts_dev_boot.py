import os
os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8'
import jax; jax.config.update('jax_platforms','cpu')
import numpy as np, time
from fhe_tpu.pke import ckks, bootstrap
from fhe_tpu.lattice import rns

N=128; SLOTS=N//2
ctx = ckks.CkksContext.create(N=N, num_levels=13, scale_bits=52, dnum=2, composite_degree=2)
print('moduli bits:', [int(q).bit_length() for q in ctx.params.moduli], flush=True)
rng = np.random.default_rng(42)
h=16
sk, pk = ctx.keygen(rng, h=h)
t0=time.time()
pre = bootstrap.setup(ctx, h=h)
print('setup: K=%d deg=%d rots=%d, %.1fs' % (pre.K, len(pre.cheb_coeffs)-1, len(pre.rot_indices), time.time()-t0), flush=True)
t0=time.time()
keys = bootstrap.keygen(ctx, sk, pre, rng)
print('keygen %.1fs' % (time.time()-t0), flush=True)
z = rng.uniform(-0.4, 0.4, size=SLOTS)
ct = ctx.encrypt(pk, z, rng)
cdrop = len(ct.moduli)-ctx.cd
ct1 = ckks.Ciphertext(rns.level_reduce(ct.c0, cdrop), rns.level_reduce(ct.c1, cdrop), ct.scale)
print('input limbs:', len(ct1.moduli), flush=True)
t0=time.time()
out = bootstrap.eval_bootstrap(ctx, ct1, pre, keys)
print('bootstrap %.1fs, output limbs: %d, scale %.4g' % (time.time()-t0, len(out.moduli), out.scale), flush=True)
got = ctx.decrypt(sk, out).real
print('err max %.3g mean %.3g' % (np.abs(got-z).max(), np.abs(got-z).mean()), flush=True)
