import os
os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8'
import jax; jax.config.update('jax_platforms','cpu')
import numpy as np
from fhe_tpu.pke import ckks, bootstrap
from fhe_tpu.pke.advanced import eval_chebyshev_series_ps
N=128; SLOTS=N//2
ctx = ckks.CkksContext.create(N=N, num_levels=13, scale_bits=52, dnum=2, composite_degree=2)
rng = np.random.default_rng(3)
sk, pk = ctx.keygen(rng, h=16)
evk = ctx.relin_key_gen(sk, rng)
K, r = 12, 3
coeffs = bootstrap._sine_cheb_coeffs(K, r)
y = rng.uniform(-0.7, 0.7, size=SLOTS)
ct = ctx.encrypt(pk, y, rng)
c1 = eval_chebyshev_series_ps(ctx, ct, coeffs, -1.0, 1.0, evk)
d1 = ctx.decrypt(sk, c1).real
want_cheb = np.polynomial.chebyshev.chebval(y, coeffs)
print('PS cheb err:', np.abs(d1-want_cheb).max(), 'scale %.4g L %d' % (c1.scale, len(c1.moduli)), flush=True)
c2 = bootstrap._double_angle(ctx, c1, evk, r)
d2 = ctx.decrypt(sk, c2).real
want = np.sin(2*np.pi*K*y)/(2*np.pi)
print('after double-angle err:', np.abs(d2-want).max(), flush=True)
