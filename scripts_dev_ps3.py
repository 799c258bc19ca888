import os
os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8'
import jax; jax.config.update('jax_platforms','cpu')
import numpy as np
from fhe_tpu.pke import ckks
from fhe_tpu.pke.ckks import Ciphertext
from fhe_tpu.pke.advanced import mul_aligned, add_aligned
from fhe_tpu.lattice import rns
N=128; SLOTS=N//2
ctx = ckks.CkksContext.create(N=N, num_levels=13, scale_bits=52, dnum=2, composite_degree=2)
rng = np.random.default_rng(3)
sk, pk = ctx.keygen(rng, h=16)
evk = ctx.relin_key_gen(sk, rng)
y = np.linspace(-0.95, 0.95, SLOTS)
ct = ctx.encrypt(pk, y, rng)
tv = lambda i: np.cos(i*np.arccos(y))
k = 4
T = {1: ct}
for i in range(2, k+1):
    half = i//2; other = i-half
    prod = mul_aligned(ctx, T[half], T[other], evk)
    prod = Ciphertext(rns.mul_scalar(prod.c0,2), rns.mul_scalar(prod.c1,2), prod.scale)
    d = abs(half-other)
    if d == 0:
        T[i] = ctx.add_plain(prod, np.full(SLOTS,-1.0))
    else:
        T[i] = add_aligned(ctx, prod, Ciphertext(rns.neg(T[d].c0), rns.neg(T[d].c1), T[d].scale))
    print('T%d err %.3g scale %.6g L%d' % (i, np.abs(ctx.decrypt(sk,T[i]).real-tv(i)).max(), T[i].scale, len(T[i].moduli)), flush=True)
g = k
for _ in range(2):
    sq = mul_aligned(ctx, T[g], T[g], evk)
    sq = Ciphertext(rns.mul_scalar(sq.c0,2), rns.mul_scalar(sq.c1,2), sq.scale)
    T[2*g] = ctx.add_plain(sq, np.full(SLOTS,-1.0))
    g *= 2
    print('T%d err %.3g scale %.6g L%d' % (g, np.abs(ctx.decrypt(sk,T[g]).real-tv(g)).max(), T[g].scale, len(T[g].moduli)), flush=True)
