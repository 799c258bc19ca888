import os
os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8'
import jax; jax.config.update('jax_platforms','cpu')
import numpy as np
from fhe_tpu.pke import ckks, bootstrap
from fhe_tpu.pke.advanced import eval_chebyshev_series_ps, eval_chebyshev_series
N=128; SLOTS=N//2
ctx = ckks.CkksContext.create(N=N, num_levels=13, scale_bits=52, dnum=2, composite_degree=2)
rng = np.random.default_rng(3)
sk, pk = ctx.keygen(rng, h=16)
evk = ctx.relin_key_gen(sk, rng)
coeffs_full = bootstrap._sine_cheb_coeffs(12, 3)
y = np.linspace(-0.95, 0.95, SLOTS)
ct = ctx.encrypt(pk, y, rng)
cv = np.polynomial.chebyshev.chebval
for deg in (8, 16, 24, 32):
    cs = list(coeffs_full[:deg+1])
    out = eval_chebyshev_series_ps(ctx, ct, cs, -1.0, 1.0, evk)
    d = ctx.decrypt(sk, out).real
    print('PS deg=%d err %.3g (L %d)' % (deg, np.abs(d - cv(y, cs)).max(), len(out.moduli)), flush=True)
# plain recurrence deg-8 for comparison
cs = list(coeffs_full[:9])
out = eval_chebyshev_series(ctx, ct, cs, -1.0, 1.0, evk)
d = ctx.decrypt(sk, out).real
print('recurrence deg=8 err %.3g' % np.abs(d - cv(y, cs)).max(), flush=True)
