import os
os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8'
import jax; jax.config.update('jax_platforms','cpu')
import numpy as np
from fhe_tpu.pke import ckks, schemeswitch as ss
from fhe_tpu.tfhe import BinFheContext
N=128; SLOTS=N//2
ctx = ckks.CkksContext.create(N=N, num_levels=15, scale_bits=26, dnum=2)
rng = np.random.default_rng(22)
sk, pk = ctx.keygen(rng)
evk = ctx.relin_key_gen(sk, rng)
tctx = BinFheContext.generate('TOY')
tsk = tctx.key_gen(rng)
k2 = ss.fhew_to_ckks_setup(ctx, sk, tsk, pk, rng)
m = rng.integers(0, 2, size=32)
lwe_cts = tctx.encrypt(tsk, m, rng)   # mod q=512, pt 4, values {0,1}
out = ss.eval_fhew_to_ckks(ctx, k2, lwe_cts, evk)
got = ctx.decrypt(sk, out).real[:32]
print('m   :', m[:16])
print('got :', np.round(got[:16], 3))
print('max err vs bits:', np.abs(got - m).max())
