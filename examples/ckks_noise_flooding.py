"""CKKS noise-flooding decryption (reference: ckks-noise-flooding.cpp,
CKKS_NOISE_FLOODING.md): counter the Li-Micciancio key-recovery attack on
approximate decryption by adding Gaussian flood noise before releasing
decryptions of adversarially chosen ciphertexts."""
import _common  # noqa: F401
import numpy as np
from fhe_tpu.pke import ckks

ctx = ckks.CkksContext.create(N=256, num_levels=4, scale_bits=30, dnum=2)
rng = np.random.default_rng(21)
sk, pk = ctx.keygen(rng)

z = rng.normal(size=128)
ct = ctx.encrypt(pk, z, rng)

plain = ctx.decrypt(sk, ct)
flooded = ctx.decrypt(sk, ct, flood_rng=np.random.default_rng(99))

e_plain = np.abs(plain.real - z).max()
e_flood = np.abs(flooded.real - z).max()
print(f"plain decrypt error   {e_plain:.2e}")
print(f"flooded decrypt error {e_flood:.2e}")
# flooding must actually perturb the output (hides the encryption noise)
assert not np.allclose(plain.real, flooded.real)
# ...while staying within application precision
assert e_flood < 1e-1
print("noise-flooded decryption: OK")
