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
rp = radix.EUINT8
a_vals = np.array([37, 213, 55, 255])
b_vals = np.array([89, 0, 200, 1])
A = radix.encrypt(params, rp, sk, a_vals, rng)
B = radix.encrypt(params, rp, sk, b_vals, rng)
# plain limb add then full propagate
S = radix.add(params, key, A, B)
print('sum limbs (pre-norm, max_limb=%d):' % S.max_limb, flush=True)
print(shortint.decrypt(params, rp.limb, sk, S.ct), flush=True)
S2 = radix.propagate_carries(params, key, S)
print('post-norm limbs:', flush=True)
print(shortint.decrypt(params, rp.limb, sk, S2.ct), flush=True)
dec = radix.decrypt(params, rp, sk, S2)
print('decoded:', dec, 'want', (a_vals+b_vals) & 255, flush=True)
# single LUT sanity: msg/carry of a value with carry
tabs = shortint.luts(params, rp.limb)
v = np.array([5, 9, 14, 3])   # values with carry bits set
ct = shortint.encrypt(params, rp.limb, sk, v, rng)
msg = shortint.apply_lut(params, key, ct, tabs['msg'], rp.limb)
car = shortint.apply_lut(params, key, ct, tabs['carry'], rp.limb)
print('msg lut:', shortint.decrypt(params, rp.limb, sk, msg), 'want', v%4, flush=True)
print('carry lut:', shortint.decrypt(params, rp.limb, sk, car), 'want', v//4, flush=True)
