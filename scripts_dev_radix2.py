import os
os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8'
import jax; jax.config.update('jax_platforms','cpu')
import numpy as np
from fhe_tpu.tfhe import BinFheContext, lwe, radix, shortint
ctx = BinFheContext.generate('TOY_RADIX')
params = ctx.params
rng = np.random.default_rng(5)
sk = ctx.key_gen(rng)
key = ctx.bt_key_gen(sk, rng)
sp = radix.EUINT8.limb
tabs = shortint.luts(params, sp)
v = np.arange(16)
ct = shortint.encrypt(params, sp, sk, v, rng)
for name, f in [('msg', lambda x: x%4), ('carry', lambda x: x//4),
                ('identity', lambda x: x%4)]:
    out = shortint.apply_lut(params, key, ct, tabs[name], sp)
    got = shortint.decrypt(params, sp, sk, out)
    want = f(v)
    print(name.ljust(8), 'got', got.tolist(), flush=True)
    print(''.ljust(8), 'want', want.tolist(), 'errors at', np.nonzero(got!=want)[0].tolist(), flush=True)
