import os
os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8'
import jax; jax.config.update('jax_platforms','cpu')
import numpy as np
from fhe_tpu.tfhe import BinFheContext, lwe, radix, shortint, funcboot
ctx = BinFheContext.generate('TOY_RADIX')
params = ctx.params
rng = np.random.default_rng(5)
sk = ctx.key_gen(rng)
key = ctx.bt_key_gen(sk, rng)
sp = radix.EUINT8.limb
q = params.q; p = sp.p; beta = funcboot.BETA
v = np.arange(16)
ct = shortint.encrypt(params, sp, sk, v, rng)
# raw phase of inputs
ph = np.asarray(lwe.noise(params, sk, ct, v, p=p))
print('fresh noise:', ph.tolist(), flush=True)
# periodic path stage 1: f0 bootstrap
ct1 = funcboot.add_const(ct, beta)
f0 = funcboot._f0_table(q, q)
ct2 = funcboot.bootstrap_func(params, key, ct1, f0, q)
# decrypt ct2 phase directly: phase = b - <a,s> (mod q)
from fhe_tpu.tfhe.lwe import _dot_mod, _sk_mod
r = np.asarray(jax.numpy.mod(ct2.b - _dot_mod(ct2.a, _sk_mod(sk, q), q), q)).astype(np.int64)
print('f0 out phase (want -q/4=%d for lower, q/4=%d upper):' % (3*q//4, q//4), flush=True)
print(r.tolist(), flush=True)
ct3 = funcboot.sub(ct, ct2)
ct3 = funcboot.add_const(ct3, beta)
ct3 = funcboot.sub_const(ct3, q >> 2)
r3 = np.asarray(jax.numpy.mod(ct3.b - _dot_mod(ct3.a, _sk_mod(sk, q), q), q)).astype(np.int64)
print('folded phase (want v*512+128 for v<8, (v-8)*512+128 for v>=8):', flush=True)
print(r3.tolist(), flush=True)
