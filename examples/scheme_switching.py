"""CKKS -> FHEW scheme switching (reference: ckksrns-schemeswitching):
CKKS slots become individually-bootstrappable LWE ciphertexts."""
import _common  # noqa: F401
import numpy as np
from fhe_tpu.pke import ckks, schemeswitch as ss
from fhe_tpu.tfhe import BinFheContext

ctx = ckks.CkksContext.create(N=128, num_levels=6, scale_bits=26, dnum=2)
rng = np.random.default_rng(5)
sk, pk = ctx.keygen(rng)
tctx = BinFheContext.generate("TOY")
tsk = tctx.key_gen(rng)
key = ss.ckks_to_fhew_setup(ctx, sk, tctx.params, tsk, rng)

z = rng.integers(0, 4, size=64).astype(np.float64)
ct = ctx.encrypt(pk, z, rng)
lwe_cts = ss.eval_ckks_to_fhew(ctx, key, ct, p=4, fhew_params=tctx.params)
got = np.asarray(tctx.decrypt(tsk, lwe_cts, p=4))
print("switched", int((got == z).sum()), "/ 64 slots exactly")
assert np.array_equal(got, z.astype(int))
print("scheme switching: OK")
