import os
os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8'
import jax; jax.config.update('jax_platforms','cpu')
import numpy as np, time
from fhe_tpu.pke import ckks, bootstrap
from fhe_tpu.pke.ckks import Ciphertext
from fhe_tpu.pke.advanced import eval_chebyshev_series_ps, add_aligned
from fhe_tpu.lattice import rns

N=128; SLOTS=N//2
ctx = ckks.CkksContext.create(N=N, num_levels=16, scale_bits=26, dnum=2)
rng = np.random.default_rng(42)
h=16
sk, pk = ctx.keygen(rng, h=h)
pre = bootstrap.setup(ctx, h=h)
keys = bootstrap.keygen(ctx, sk, pre, rng)
z = rng.uniform(-0.4, 0.4, size=SLOTS)
ct = ctx.encrypt(pk, z, rng)
ct1 = ckks.Ciphertext(rns.level_reduce(ct.c0, len(ct.moduli)-1),
                      rns.level_reduce(ct.c1, len(ct.moduli)-1), ct.scale)
params = ctx.params
q0 = float(params.moduli[0]); delta_in = ct1.scale
raised = bootstrap._raise_to_full(ctx, ct1)
print('raised L=%d scale=%.4g' % (len(raised.moduli), raised.scale))

# plaintext-check raise: decrypt raised, value should be (w/q0 + I)
got = ctx.decrypt(sk, raised)
# expected slots: E*(w)/q0 + E*I... compare vs direct: slots(ct1)*delta/q0 mod-ish
zin = ctx.decrypt(sk, ct1)
print('raise rel check (should contain z*delta/q0 + integers):',
      np.abs(got.real - zin.real*delta_in/q0).max() % 1.0)

mods = raised.moduli
s1 = float(mods[-1])*float(mods[-2])
M1 = pre.E_lo.conj().T / (N * pre.K)
enc = bootstrap.bsgs_linear_transform(ctx, raised, M1, keys['rot'], s1, pre.bsgs_g)
enc = ctx.rescale(ctx.rescale(enc))
print('enc L=%d scale=%.4g' % (len(enc.moduli), enc.scale))
enc_re, enc_im = bootstrap._conjugate_split(ctx, enc, keys)
# check: slots of enc_re should be v_lo/(K q0) in [-1,1]
d_re = ctx.decrypt(sk, enc_re); d_im = ctx.decrypt(sk, enc_im)
print('enc_re range %.3f  imagpart %.2g' % (np.abs(d_re.real).max(), np.abs(d_re.imag).max()))
print('enc_im range %.3f  imagpart %.2g' % (np.abs(d_im.real).max(), np.abs(d_im.imag).max()))

def sine(c):
    c = eval_chebyshev_series_ps(ctx, c, pre.cheb_coeffs, -1.0, 1.0, keys['evk'])
    return bootstrap._double_angle(ctx, c, keys['evk'], pre.r)
s_re = sine(enc_re); s_im = sine(enc_im)
print('s_re L=%d scale=%.6g; s_im L=%d scale=%.6g' % (len(s_re.moduli), s_re.scale, len(s_im.moduli), s_im.scale))
dr = ctx.decrypt(sk, s_re)
want = d_re.real  # ~ v/(Kq0); sine gives (1/2pi) sin(2 pi K y) ~ w/q0
print('sine out range %.4g' % np.abs(dr.real).max())
