import os
os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8'
import jax; jax.config.update('jax_platforms','cpu')
import numpy as np
from fhe_tpu.pke import ckks
from fhe_tpu.pke.advanced import mul_aligned, add_aligned
N=128; SLOTS=N//2
ctx = ckks.CkksContext.create(N=N, num_levels=16, scale_bits=26, dnum=2)
rng = np.random.default_rng(3)
sk, pk = ctx.keygen(rng, h=16)
evk = ctx.relin_key_gen(sk, rng)
y = rng.uniform(-0.9, 0.9, size=SLOTS)
ct = ctx.encrypt(pk, y, rng)
print('fresh err:', np.abs(ctx.decrypt(sk, ct).real - y).max())
m = ctx.rescale(ctx.mul_plain(ct, np.full(SLOTS, 0.5)))
print('mul_plain err:', np.abs(ctx.decrypt(sk, m).real - 0.5*y).max())
sq = ctx.rescale(ctx.mul(ct, ct, evk))
print('square err:', np.abs(ctx.decrypt(sk, sq).real - y*y).max(), 'scale %.5g'%sq.scale)
cur, want = sq, y*y
for i in range(4):
    cur = mul_aligned(ctx, cur, cur, evk); want = want*want
    print('chain sq%d err: %.3g scale %.5g L=%d' % (i, np.abs(ctx.decrypt(sk,cur).real-want).max(), cur.scale, len(cur.moduli)))
