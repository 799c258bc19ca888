import os
os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8'
import jax; jax.config.update('jax_platforms','cpu')
import numpy as np
from fhe_tpu.pke import ckks, bootstrap
from fhe_tpu.pke.ckks import Ciphertext, encode
from fhe_tpu.pke.advanced import eval_chebyshev_series_ps, add_aligned
from fhe_tpu.lattice import rns

N=128; SLOTS=N//2
ctx = ckks.CkksContext.create(N=N, num_levels=13, scale_bits=52, dnum=2, composite_degree=2)
rng = np.random.default_rng(42); h=16
sk, pk = ctx.keygen(rng, h=h)
pre = bootstrap.setup(ctx, h=h)
keys = bootstrap.keygen(ctx, sk, pre, rng)
z = rng.uniform(-0.4, 0.4, size=SLOTS)
ct = ctx.encrypt(pk, z, rng)
cd = ctx.cd
ct1 = Ciphertext(rns.level_reduce(ct.c0, len(ct.moduli)-cd),
                 rns.level_reduce(ct.c1, len(ct.moduli)-cd), ct.scale)
params = ctx.params; q0 = float(bootstrap._q0(ctx)); delta = ct1.scale
w = encode(z, N, delta).astype(np.float64)
raised = bootstrap._raise_to_full(ctx, ct1)
mods = raised.moduli
s1 = ctx.scale / q0
for q in mods[-cd:]: s1 *= float(q)
M1 = pre.E_lo.conj().T / (N * pre.K)
enc = bootstrap.bsgs_linear_transform(ctx, raised, M1, keys['rot'], s1, pre.bsgs_g)
enc = ctx.rescale(enc)
print('enc scale %.5g L%d' % (enc.scale, len(enc.moduli)), flush=True)
enc_re, enc_im = bootstrap._conjugate_split(ctx, enc, keys)
d_re = ctx.decrypt(sk, enc_re).real; d_im = ctx.decrypt(sk, enc_im).real
chk = (np.asarray(d_re)*pre.K*q0 - w[:SLOTS]) / q0
print('CtS check (near-int):', np.abs(chk - np.rint(chk)).max(), flush=True)
print('CtS residual (w-part):', np.abs((np.asarray(d_re)*pre.K*q0 - np.rint(chk)*q0 - w[:SLOTS])).max()/delta, flush=True)
def sine(c):
    c = eval_chebyshev_series_ps(ctx, c, pre.cheb_coeffs, -1.0, 1.0, keys['evk'])
    return bootstrap._double_angle(ctx, c, keys['evk'], pre.r)
s_re = sine(enc_re); s_im = sine(enc_im)
dr = ctx.decrypt(sk, s_re).real; di = ctx.decrypt(sk, s_im).real
print('sine_re err vs w_lo/q0 (in z units):', np.abs(dr - w[:SLOTS]/q0).max()*q0/delta, flush=True)
print('sine_im err (z units):', np.abs(di - w[SLOTS:]/q0).max()*q0/delta, flush=True)
y = add_aligned(ctx, s_re, Ciphertext(rns.mul_monomial(s_im.c0, N//2),
                                      rns.mul_monomial(s_im.c1, N//2), s_im.scale))
s2 = 1.0
for q in y.moduli[-cd:]: s2 *= float(q)
out = bootstrap.bsgs_linear_transform(ctx, y, pre.E_lo, keys['rot'], s2, pre.bsgs_g)
out = ctx.rescale(out)
out = Ciphertext(out.c0, out.c1, out.scale*delta/q0)
got = ctx.decrypt(sk, out).real
print('final err:', np.abs(got - z).max(), 'L out:', len(out.moduli), flush=True)
