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
y = np.linspace(-0.95, 0.95, SLOTS)   # structured input to see error shape
ct = ctx.encrypt(pk, y, rng)
c1 = eval_chebyshev_series_ps(ctx, ct, coeffs, -1.0, 1.0, evk)
d1 = ctx.decrypt(sk, c1).real
err = d1 - np.polynomial.chebyshev.chebval(y, coeffs)
print('max err %.3g rms %.3g' % (np.abs(err).max(), err.std()), flush=True)
# project error onto Chebyshev basis T_0..T_40
V = np.stack([np.cos(i*np.arccos(y)) for i in range(41)], axis=1)
delta, *_ = np.linalg.lstsq(V, err, rcond=None)
big = np.argsort(-np.abs(delta))[:8]
for i in big:
    print('T_%d coefficient error: %.3g' % (i, delta[i]), flush=True)
print('residual after fit: %.3g' % np.abs(err - V@delta).max(), flush=True)
