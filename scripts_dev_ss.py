import os
os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8'
import jax; jax.config.update('jax_platforms','cpu')
import numpy as np
from fhe_tpu.pke import ckks, schemeswitch as ss, rlwe
from fhe_tpu.tfhe import BinFheContext, lwe as tlwe
N=128; SLOTS=N//2
ctx = ckks.CkksContext.create(N=N, num_levels=6, scale_bits=26, dnum=2)
rng = np.random.default_rng(21)
sk, pk = ctx.keygen(rng)
tctx = BinFheContext.generate('TOY')
tsk = tctx.key_gen(rng)
key = ss.ckks_to_fhew_setup(ctx, sk, tctx.params, tsk, rng)
z = rng.integers(0, 4, size=SLOTS).astype(np.float64)
ct = ctx.encrypt(pk, z, rng)
# step 1: extraction under the ring key (no keyswitch)
cts_ring = ss.eval_ckks_to_fhew(ctx, key, ct, p=4)
ring_sk = tlwe.LweSecretKey(s=jax.numpy.asarray(np.asarray(sk.s_signed, dtype=np.int32)))
got = np.asarray(tlwe.decrypt(tctx.params, ring_sk, cts_ring, p=4))
print('ring-key extraction match:', int((got == z.astype(int)).sum()), '/', SLOTS)
# step 2: full switch to the TOY FHEW key
cts_f = ss.eval_ckks_to_fhew(ctx, key, ct, p=4, fhew_params=tctx.params)
got2 = np.asarray(tctx.decrypt(tsk, cts_f, p=4))
print('fhew-key switch match:', int((got2 == z.astype(int)).sum()), '/', SLOTS)
