import os
os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8'
import jax; jax.config.update('jax_platforms','cpu')
import numpy as np
from fhe_tpu.pke import ckks, bootstrap
from fhe_tpu.pke.ckks import Ciphertext
from fhe_tpu.pke.advanced import mul_aligned, add_aligned, _cheb_divmod
from fhe_tpu.lattice import rns
N=128; SLOTS=N//2
ctx = ckks.CkksContext.create(N=N, num_levels=13, scale_bits=52, dnum=2, composite_degree=2)
rng = np.random.default_rng(3)
sk, pk = ctx.keygen(rng, h=16)
evk = ctx.relin_key_gen(sk, rng)
y = np.linspace(-0.95, 0.95, SLOTS)
ct = ctx.encrypt(pk, y, rng)
cv = np.polynomial.chebyshev.chebval
coeffs = list(bootstrap._sine_cheb_coeffs(12, 3)[:25])   # deg 24
deg = len(coeffs)-1
k = max(2, int(np.sqrt((deg+1)/2.0)+0.5))
print('k =', k, 'deg =', deg, flush=True)
T = {1: ct}
for i in range(2, k+1):
    half = i//2; other = i-half
    prod = mul_aligned(ctx, T[half], T[other], evk)
    prod = Ciphertext(rns.mul_scalar(prod.c0,2), rns.mul_scalar(prod.c1,2), prod.scale)
    d = abs(half-other)
    T[i] = ctx.add_plain(prod, np.full(SLOTS,-1.0)) if d==0 else \
        add_aligned(ctx, prod, Ciphertext(rns.neg(T[d].c0), rns.neg(T[d].c1), T[d].scale))
g = k
while 2*g <= deg:
    sq = mul_aligned(ctx, T[g], T[g], evk)
    sq = Ciphertext(rns.mul_scalar(sq.c0,2), rns.mul_scalar(sq.c1,2), sq.scale)
    T[2*g] = ctx.add_plain(sq, np.full(SLOTS,-1.0))
    g *= 2

def emit(cs, depth):
    d = len(cs)-1
    while d>0 and abs(cs[d])<1e-14: d-=1
    cs = cs[:d+1]
    if d <= k:
        acc = None
        for i in range(1, d+1):
            if abs(cs[i])<1e-14: continue
            term = ctx.rescale(ctx.mul_plain(T[i], np.full(SLOTS, cs[i])))
            acc = term if acc is None else add_aligned(ctx, acc, term)
        if abs(cs[0])>1e-14:
            if acc is None:
                acc = ctx.rescale(ctx.mul_plain(T[1], np.full(SLOTS,0.0)))
            acc = ctx.add_plain(acc, np.full(SLOTS, cs[0]))
        if acc is not None:
            e = np.abs(ctx.decrypt(sk,acc).real - cv(y, cs)).max()
            if e > 1e-9: print('%sLEAF deg%d err %.3g' % (' '*depth, d, e), flush=True)
        return acc
    gg = k
    while 2*gg <= d: gg *= 2
    q, r = _cheb_divmod(cs, gg)
    cq = emit(q, depth+1); cr = emit(r, depth+1)
    if cq is None: return cr
    prod = mul_aligned(ctx, cq, T[gg], evk)
    ep = np.abs(ctx.decrypt(sk,prod).real - cv(y,q)*np.cos(gg*np.arccos(y))).max()
    print('%sprod(q*T%d) err %.3g  |q|max %.3g scales cq %.5g T %.5g' % (' '*depth, gg, ep, np.abs(cv(y,q)).max(), cq.scale, T[gg].scale), flush=True)
    out = prod if cr is None else add_aligned(ctx, prod, cr)
    eo = np.abs(ctx.decrypt(sk,out).real - cv(y,cs)).max()
    print('%scombined deg%d err %.3g' % (' '*depth, d, eo), flush=True)
    return out

out = emit(coeffs, 0)
