"""Threshold decryption, PKE (reference: threshold-fhe.cpp) and TFHE
batched t-of-n (threshold/batch_threshold.h)."""
import _common  # noqa: F401
import numpy as np
from fhe_tpu.pke import ckks, multiparty
from fhe_tpu.lattice import rns
from fhe_tpu.tfhe import BinFheContext
from fhe_tpu.tfhe import threshold as th

# --- 3-party CKKS joint decryption ---
ctx = ckks.CkksContext.create(N=256, num_levels=4, scale_bits=28, dnum=2)
rng = np.random.default_rng(3)
sks, pk = multiparty.multiparty_keygen(ctx.params, 3, rng)
z = rng.normal(size=128)
ct = ctx.encrypt(pk, z, rng)
lead = multiparty.decrypt_lead(ctx.params, sks[0], ct.c0, ct.c1, rng)
mains = [multiparty.decrypt_main(ctx.params, s, ct.c1, rng)
         for s in sks[1:]]
ph = multiparty.fuse([lead] + mains)
Q = 1
for q in ct.moduli:
    Q *= q
got = ckks.decode(ckks._center(rns.to_bigint(ph), Q), 256, ct.scale).real
print("3-party CKKS err:", np.abs(got - z).max())

# --- additive n-of-n TFHE with verifiable partials ---
tctx = BinFheContext.generate("TOY")
tsk = tctx.key_gen(rng)
bits = rng.integers(0, 2, size=8)
tct = tctx.encrypt(tsk, bits, rng)
cfg = th.ThresholdConfig(threshold=3, total_parties=3, scheme="additive")
shares, vks = th.generate_key_shares(np.asarray(tsk.s), tct.modulus, cfg)
out = th.threshold_decrypt(cfg, tct, shares, vks, p=4)
print("TFHE threshold bits:", (out % 2).tolist(), "expected", bits.tolist())
assert np.array_equal(out % 2, bits)
print("threshold decryption: OK")
